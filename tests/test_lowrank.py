"""Low-rank compression (lenda/LoSVD analog, quant/lowrank.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.quant.lowrank import lowrank_error, svd_compress


def test_lowrank_recovers_planted_rank():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (256, 16))
    b = jax.random.normal(jax.random.PRNGKey(1), (16, 128))
    w = (a @ b) + 0.001 * jax.random.normal(jax.random.PRNGKey(2),
                                            (256, 128))
    fa, fb = svd_compress(w, energy=0.99)
    assert fa.shape[1] <= 24           # finds ~the planted rank
    assert lowrank_error(w, fa, fb) < 0.05


def test_lowrank_explicit_rank_and_matmul_path():
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 64))
    fa, fb = svd_compress(w, rank=32)
    assert fa.shape == (128, 32) and fb.shape == (32, 64)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 128), jnp.bfloat16)
    y = (x @ fa) @ fb
    ref = x.astype(jnp.float32) @ w
    # rank-32 of a random 128x64: captures half the mass, coarse check
    assert np.isfinite(np.asarray(y, np.float32)).all()
    full_a, full_b = svd_compress(w, rank=64)
    y2 = (x.astype(jnp.float32) @ full_a.astype(jnp.float32)
          ) @ full_b.astype(jnp.float32)
    assert float(jnp.abs(y2 - ref).max()) / float(jnp.abs(ref).max()) < 0.02
