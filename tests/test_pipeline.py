"""Pipeline parallelism (GPipe microbatch schedule over a pp mesh axis)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koifish_tpu.config import ModelCard
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.parallel.mesh import make_mesh
from koifish_tpu.parallel.pipeline import (pipeline_logits, pipeline_loss,
                                           stack_for_pipeline)


def tiny_card(n_layer=2):
    return ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=n_layer,
                               n_embd=64, n_head=4, n_kv_head=2, head_dim=16,
                               n_ffn=128, n_ctx=32, max_pos=64)


def test_pipeline_logits_match_single_device():
    card = tiny_card(4)
    params = init_params(card, jax.random.PRNGKey(0))
    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    stage_layers, other = stack_for_pipeline(params, 2)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 128)
    ref = model_forward(card, params, tokens)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        out = pipeline_logits(card, stage_layers, other, tokens, mesh,
                              n_micro=2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_pipeline_loss_trains():
    card = tiny_card(2)
    params = init_params(card, jax.random.PRNGKey(0))
    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    stage_layers, other = stack_for_pipeline(params, 2)

    def batch(key):
        s = jax.random.randint(key, (4, 1), 0, 64)
        return ((s + jnp.arange(17)[None]) % 64).astype(jnp.int32)

    @jax.jit
    def step(sl, ot, tokens):
        def loss_fn(sl, ot):
            return pipeline_loss(card, sl, ot, tokens, mesh, n_micro=2)
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(sl, ot)
        sl = jax.tree_util.tree_map(
            lambda p, g: (p.astype(jnp.float32) - 0.05 * g).astype(p.dtype),
            sl, grads[0])
        ot = jax.tree_util.tree_map(
            lambda p, g: (p.astype(jnp.float32) - 0.05 * g).astype(p.dtype),
            ot, grads[1])
        return sl, ot, loss

    key = jax.random.PRNGKey(0)
    losses = []
    ctx = (jax.sharding.use_mesh(mesh)
           if hasattr(jax.sharding, "use_mesh") else mesh)
    with ctx:
        for _ in range(25):
            key, k = jax.random.split(key)
            stage_layers, other, loss = step(stage_layers, other, batch(k))
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_koifish_pp_cli(tmp_path):
    """koifish --pp 2 trains end-to-end on a 2-stage CPU pipeline."""
    import csv as csvmod
    import json

    import numpy as np

    from koifish_tpu.data import MAGIC_QWEN3, write_shard
    from tests.test_cli import run_cli
    seq = (np.arange(30000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "p_train_0.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "model": {"arch": "QWEN3", "vocab_size": 300,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 64,
                                                "Ffn": 128, "Head": 4,
                                                "KVHead": 2, "head_dim": 16}}},
        "train": {"batch": 8, "learning-rate": 0.01, "dump-every": 5,
                  "warmup": 3,
                  "optimizatioin": {"method": "adamw"}},
        "datasets": {"train": {"glob": str(tmp_path / "p_train_*.bin"),
                               "name": "pattern"}},
        "debug": {"most_iter": 15},
        "seed": 42,
    }
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--pp", "2",
                "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "pipeline: pp=2" in r.stdout
    with open(tmp_path / "koifish_loss.csv") as f:
        rows = list(csvmod.DictReader(f))
    assert len(rows) == 15
    assert float(rows[-1]["loss"]) < float(rows[0]["loss"])


def test_pipeline_needs_divisible_layers():
    card = tiny_card(3)
    params = init_params(card, jax.random.PRNGKey(0))
    with pytest.raises(AssertionError):
        stack_for_pipeline(params, 2)
