"""Model presets, analytic param/FLOP counts, memory planner."""
import pytest

from koifish_tpu.config import ModelCard
from koifish_tpu.parallel.planner import (param_count, plan_serving,
                                          plan_training)
from koifish_tpu.utils.mfu import matmul_params, train_step_flops


@pytest.mark.parametrize("name,lo,hi", [
    ("gpt2-124m", 110e6, 140e6),
    ("gpt2-1558m", 1.4e9, 1.7e9),
    ("qwen2.5-0.5b", 430e6, 640e6),
    ("qwen3-0.6b", 550e6, 780e6),
    ("qwen3-8b", 7.5e9, 8.5e9),
    ("qwen3-32b", 31e9, 34e9),
])
def test_preset_param_counts(name, lo, hi):
    assert lo < param_count(ModelCard.preset(name)) < hi


def test_preset_unknown_raises():
    with pytest.raises(ValueError):
        ModelCard.preset("qwen3-9000b")


def test_flops_gpt2():
    card = ModelCard.preset("gpt2-124m")
    assert 110e6 < matmul_params(card) < 135e6
    f = train_step_flops(card, 16 * 1024)
    assert 10e12 < f < 20e12     # 6*124M*16k = 12.2T + attention


def test_plan_32b_serving_needs_tp():
    plan = plan_serving(ModelCard.preset("qwen3-32b"), batch=8, ctx=4096)
    assert plan.n_chips >= 2 and plan.mesh["tp"] == plan.n_chips


def test_plan_0p6b_fits_one_chip():
    s = plan_serving(ModelCard.preset("qwen3-0.6b"), batch=32, ctx=1024)
    assert s.n_chips == 1
    t = plan_training(ModelCard.preset("qwen3-0.6b"), batch=8, ctx=1024,
                      remat=False)
    assert t.n_chips == 1        # measured on hardware (r2 sweep)


def test_plan_8b_training_shards():
    t = plan_training(ModelCard.preset("qwen3-8b"), batch=8, ctx=4096)
    assert t.n_chips >= 4
    assert t.per_chip_bytes < 16 * 1024 ** 3
    assert set(t.mesh) <= {"dp", "fsdp"}
    assert t.summary()


def test_debug_switches_parse_and_run():
    """DEBUG/DUMP switch analogs (reference CLI_params.hpp:720-785):
    graph_dump writes StableHLO, time_most bounds the loop,
    check_tensor_norm surfaces per-leaf grad norms, nn_structure dumps."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from koifish_tpu.config import CLIParams
    from koifish_tpu.train.trainer import init_train_state, train_loop
    from koifish_tpu.utils.dump import model_structure

    d = tempfile.mkdtemp()
    hlo = os.path.join(d, "step.stablehlo")
    cfg = {
        "model": {"arch": "QWEN3", "vocab_size": 64,
                  "parameter": {"Layer": 2, "transformer": {
                      "Ctx": 16, "Embed": 32, "Head": 2, "KVHead": 1,
                      "Ffn": 64, "head_dim": 16}}},
        "train": {"batch": 2, "learning-rate": 0.01, "dump-every": 1},
        "debug": {"graph_dump": hlo, "check_tensor_norm": True,
                  "Time_most": 300.0, "most_iter": 3},
    }
    p = CLIParams.from_json(cfg)
    assert p.train.graph_dump == hlo and p.train.check_tensor_norm
    assert p.train.time_most == 300.0
    state = init_train_state(p.model, p.train)
    toks = jnp.zeros((1, 2, 17), jnp.int32)
    lines = []
    state, infos = train_loop(p.model, p.train, state,
                              iter([{"tokens": toks}] * 5), total_steps=5,
                              log_fn=lines.append)
    assert len(infos.rows) == 3                   # most_iter cap
    assert os.path.exists(hlo) and "module @jit_step" in open(hlo).read()[:200]
    assert any("worst_leaf=" in ln for ln in lines)
    txt = model_structure(state.params)
    assert "total:" in txt and "wte" in txt


def test_plan_decode_explains_b_scaling_walls():
    """The decode memory model must reproduce BOTH measured regimes on a
    16 GB v5e (Qwen3-0.6B INT4 weights + INT8 KV, S=1024):
    - legacy stacked→split_cache path (round 4): B=64 ran, B=128 OOMed —
      the 2x-KV admission transient;
    - layered-born caches (round 5, the production/default path): the
      transient is one layer, B=128 runs (measured 5661 agg tok/s)."""
    from koifish_tpu.config import ModelCard
    from koifish_tpu.parallel.planner import plan_decode

    card = ModelCard.from_arch(
        "QWEN3", vocab_size=151936, n_layer=28, n_embd=1024, n_head=16,
        n_kv_head=8, head_dim=128, n_ffn=3072, n_ctx=1024, max_pos=32768)
    p64 = plan_decode(card, 64, 1024, layered=False)
    p128 = plan_decode(card, 128, 1024, layered=False)
    assert p64["fits"] and not p128["fits"], (p64, p128)
    # the wall is the admission copy, not steady-state KV: born-layered
    # (default) removes it and B=128 fits — the measured round-5 result
    l128 = plan_decode(card, 128, 1024)
    assert l128["fits"], l128
    assert l128["kv_transient"] < p128["kv_transient"] // 20
    # the 32B serving target on the planner's TP=8 mesh: batch 32 fits
    c32 = ModelCard.from_arch(
        "QWEN3", vocab_size=151936, n_layer=64, n_embd=5120, n_head=64,
        n_kv_head=8, head_dim=128, n_ffn=27648, n_ctx=4096, max_pos=40960)
    p32 = plan_decode(c32, 32, 4096, n_chips=8)
    assert p32["fits"], p32
