"""Op-level correctness: fused chunked CE vs dense CE (values + grads)."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.ops.cross_entropy import cross_entropy_loss, fused_ce_loss


def test_fused_ce_matches_dense():
    key = jax.random.PRNGKey(0)
    B, T, E, V = 2, 8, 32, 1000   # V not divisible by chunk -> tests padding
    hidden = jax.random.normal(key, (B, T, E))
    head = jax.random.normal(jax.random.PRNGKey(1), (E, V)) * 0.1
    targets = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)
    mask = (jnp.arange(T)[None, :] < 6).astype(jnp.float32) * jnp.ones((B, 1))

    logits = jnp.einsum("bte,ev->btv", hidden,
                        head.astype(jnp.bfloat16).astype(jnp.float32))
    dense, dense_tok = cross_entropy_loss(logits, targets, mask)
    fused, fused_tok = fused_ce_loss(hidden, head, targets, mask, chunk=256)
    np.testing.assert_allclose(float(dense), float(fused), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(dense_tok), np.asarray(fused_tok),
                               rtol=3e-2, atol=3e-2)


def test_fused_ce_grads_match():
    key = jax.random.PRNGKey(0)
    B, T, E, V = 1, 4, 16, 512
    hidden = jax.random.normal(key, (B, T, E))
    head = jax.random.normal(jax.random.PRNGKey(1), (E, V)) * 0.1
    targets = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)

    def dense_loss(h, w):
        logits = jnp.einsum("bte,ev->btv", h,
                            w.astype(jnp.bfloat16).astype(jnp.float32))
        return cross_entropy_loss(logits, targets)[0]

    def fused_loss(h, w):
        return fused_ce_loss(h, w, targets, chunk=128)[0]

    gd = jax.grad(dense_loss, argnums=(0, 1))(hidden, head)
    gf = jax.grad(fused_loss, argnums=(0, 1))(hidden, head)
    for a, b, n in zip(gd, gf, ["dh", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3), n
