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


def _vocab_dots(closed_jaxpr, vocab):
    """Yield (eqn, under_cond) for every dot_general whose output's last
    dim is ``vocab``, walking nested jaxprs (pjit/scan/while/cond)."""
    from jax._src import core as jcore

    def subjaxprs(eqn):
        for v in eqn.params.values():
            if isinstance(v, jcore.ClosedJaxpr):
                yield v.jaxpr
            elif isinstance(v, jcore.Jaxpr):
                yield v
            elif isinstance(v, (tuple, list)):
                for x in v:
                    if isinstance(x, jcore.ClosedJaxpr):
                        yield x.jaxpr
                    elif isinstance(x, jcore.Jaxpr):
                        yield x

    def walk(jaxpr, under):
        for eqn in jaxpr.eqns:
            if (eqn.primitive.name == "dot_general"
                    and eqn.outvars[0].aval.shape
                    and eqn.outvars[0].aval.shape[-1] == vocab):
                yield eqn, under
            nxt = under or eqn.primitive.name == "cond"
            for sub in subjaxprs(eqn):
                yield from walk(sub, nxt)

    yield from walk(closed_jaxpr.jaxpr, False)


def test_pipeline_head_gemm_only_under_cond():
    """The [mb*T, E] x [E, V] head GEMM must sit under lax.cond so only
    the last stage's active ticks pay it (round 2 ran it on every stage
    every tick — (M+P-1) x P head GEMMs instead of M)."""
    # vocab distinct from every other model dim so the jaxpr walk can't
    # mistake an FFN dot for the head GEMM
    card = ModelCard.from_arch("QWEN3", vocab_size=160, n_layer=2,
                               n_embd=64, n_head=4, n_kv_head=2,
                               head_dim=16, n_ffn=128, n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    sl, ot = stack_for_pipeline(params, 2)
    tokens = jnp.zeros((4, 17), jnp.int32)

    with mesh:
        jxp = jax.make_jaxpr(
            lambda sl, ot: pipeline_loss(card, sl, ot, tokens, mesh, 2))(sl, ot)
    dots = list(_vocab_dots(jxp, card.vocab_size))
    assert dots, "no head GEMM found at all"
    outside = [e for e, under in dots if not under]
    assert not outside, f"{len(outside)} head GEMMs outside lax.cond"


def test_pipeline_1f1b_matches_gpipe_grads():
    """Hand-staged 1F1B (jax.vjp per stage, ring stash, O(P) activation
    memory) computes the SAME loss and grads as AD over the gpipe loop."""
    from koifish_tpu.parallel.pipeline import pipeline_loss_and_grads_1f1b

    card = tiny_card(4)
    params = init_params(card, jax.random.PRNGKey(0))
    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    sl, ot = stack_for_pipeline(params, 2)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 17), 0, 128
                                ).astype(jnp.int32)

    with mesh:
        l1, g1 = jax.value_and_grad(
            lambda p: pipeline_loss(card, p["stages"], p["other"], tokens,
                                    mesh, 4))({"stages": sl, "other": ot})
        l2, g2 = pipeline_loss_and_grads_1f1b(card, sl, ot, tokens, mesh, 4)
    assert abs(float(l1) - float(l2)) / float(l1) < 1e-3
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v in jax.tree_util.tree_leaves_with_path(g1):
        a = np.asarray(v, np.float32)
        b = np.asarray(flat2[jax.tree_util.keystr(k)], np.float32)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
        assert rel < 0.05, (jax.tree_util.keystr(k), rel)


def test_pipeline_1f1b_train_step():
    """make_pp_train_step (default schedule=1f1b) trains: loss falls."""
    from koifish_tpu.config import TrainCard
    from koifish_tpu.parallel.pipeline import make_pp_train_step
    from koifish_tpu.train.optimizer import init_opt_state

    card = tiny_card(2)
    params = init_params(card, jax.random.PRNGKey(0))
    mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
    sl, ot = stack_for_pipeline(params, 2)
    tcard = TrainCard(batch=8, lr=0.01, warmup=3)
    step = make_pp_train_step(card, tcard, mesh, n_micro=4, total_steps=20)
    opt = init_opt_state({"stages": sl, "other": ot}, "adamw")

    key = jax.random.PRNGKey(0)
    losses = []
    with mesh:
        for _ in range(15):
            key, k = jax.random.split(key)
            s = jax.random.randint(k, (8, 1), 0, 64)
            toks = ((s + jnp.arange(17)[None]) % 64).astype(jnp.int32)
            sl, ot, opt, m = step(sl, ot, opt, toks)
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses
