"""Pinned golden losses — the reference's regression strategy.

The reference pins short-run losses to rel_tol=1e-3 (``CheckResult``,
cases/test_lite.py:17-34, goldens :54-120 e.g. Qwen3-596M 7.980@80it).
These are the rebuild's equivalents: CPU platform, fixed seeds
(jax_threefry_partitionable, conftest), synthetic "+1 mod 64" stream.
A drift > 1e-3 in any pinned value means the numerics of init / forward
/ CE / AdamW changed — investigate before re-pinning.

Pinned on jax 0.9.0 / CPU, 2026-08-17; AdamW/Muon curves re-pinned
2026-08-20 with bf16 stochastic rounding default-on (identical seeds —
SR streams derive from the step rng, so the pins stay deterministic).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koifish_tpu.config import ModelCard, SamplerCard, TrainCard
from koifish_tpu.train.trainer import init_train_state, make_train_step

REL_TOL = 1e-3   # reference cases/test_lite.py:29


def _run(card, iters):
    tcard = TrainCard(batch=8, lr=0.01, warmup=5, optimizer="adamw", seed=42)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=40)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(iters):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return state, losses


def _check(got, want):
    assert abs(got - want) <= REL_TOL * abs(want), \
        f"golden drift: got {got!r}, pinned {want!r} (rel_tol {REL_TOL})"


def test_qwen3_golden_losses():
    card = ModelCard.from_arch(
        "QWEN3", vocab_size=128, n_layer=2, n_embd=64, n_head=4, n_kv_head=2,
        head_dim=16, n_ffn=128, n_ctx=32, max_pos=64)
    state, losses = _run(card, 30)
    _check(losses[0], 4.8678202629089355)
    # re-pinned r5: stochastic rounding on bf16 params default-on
    # (train/optimizer.py::stochastic_round — CU_adamw_p seeded-SR parity;
    # second re-pin when SR bits moved from threefry to the murmur hash)
    _check(losses[9], 1.847961187362671)
    _check(losses[29], 0.044563766568899155)

    # generation golden: trained + INT4-quantized model continues the
    # pattern EXACTLY (the analog of the reference's chat answer
    # substrings, test_lite.py:36-53)
    from koifish_tpu.config import QuantCard
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.serve import generate, init_cache
    qc = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                              "group_size": 32})
    qparams = quantize_params(state.params, qc, card)
    cache = init_cache(card.n_layer, 1, 64, card.n_kv_head, card.head_dim)
    prompt = (jnp.arange(5)[None] + 10).astype(jnp.int32)
    toks, _ = generate(card, qparams, prompt, cache,
                       SamplerCard(temperature=0.0), max_new_tokens=10)
    assert toks[0].tolist() == [(15 + i) % 64 for i in range(10)]


def test_gpt2_golden_losses():
    card = ModelCard.from_arch(
        "GPT2", vocab_size=128, n_layer=2, n_embd=64, n_head=4, n_kv_head=4,
        head_dim=16, n_ffn=256, n_ctx=32, max_pos=64)
    _, losses = _run(card, 12)
    _check(losses[0], 4.865329265594482)
    _check(losses[11], 1.5521903038024902)  # re-pinned r5: SR default-on


def test_muon_golden_losses():
    """Muon (Newton–Schulz) pinned curve — reference PIPE_Muon analog."""
    card = ModelCard.from_arch(
        "QWEN3", vocab_size=128, n_layer=2, n_embd=64, n_head=4, n_kv_head=2,
        head_dim=16, n_ffn=128, n_ctx=32, max_pos=64)
    tcard = TrainCard(batch=8, lr=0.01, warmup=5, optimizer="muon", seed=42)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=40)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(12):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    _check(losses[0], 4.867818355560303)
    # re-pinned after r2 muon fix: embeddings/head moved to AdamW
    # (orthogonalizing the embedding basis was costing 2.4x at step 12)
    _check(losses[11], 1.348608136177063)   # re-pinned r5: SR default-on


def test_salmon_golden_losses():
    """Diffusion-LM (Salmon) masked-reconstruction pinned curve."""
    card = ModelCard.from_arch(
        "SALMON", vocab_size=128, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=2, head_dim=16, n_ffn=128, n_ctx=32, max_pos=64)
    _, losses = _run(card, 12)
    _check(losses[0], 4.895137310028076)
    _check(losses[11], 4.374874114990234)


def test_fused_ce_golden_losses():
    """Large-vocab chunked fused-classifier path (vocab >= 65536 —
    the Qwen3 production loss path) pinned curve."""
    card = ModelCard.from_arch(
        "QWEN3", vocab_size=66560, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=2, head_dim=16, n_ffn=128, n_ctx=32, max_pos=64)
    _, losses = _run(card, 8)
    _check(losses[0], 11.105453491210938)
    _check(losses[7], 7.9970879554748535)   # re-pinned r5: SR hash bits


def test_cosine_epoch_schedule_restarts():
    """COSINE_EPOCH: the whole schedule (incl. warmup) repeats every
    epoch_steps (LearnSKDU COSINE_EPOCH: step %= mostIter=nEpochIter,
    Scheduler.hpp:62-64, Scheduler.cpp:24-26)."""
    import numpy as np
    from koifish_tpu.train.schedule import lr_at

    kw = dict(kind="cosine_epoch", base_lr=1e-3, total_steps=1000,
              warmup=10, min_ratio=0.01, epoch_steps=100)
    xs = np.array([float(lr_at(s, **kw)) for s in range(250)])
    # periodic with period 100
    np.testing.assert_allclose(xs[:100], xs[100:200], rtol=1e-6)
    # warmup ramps from ~0 each epoch; peak right after warmup
    assert xs[0] < 1e-4 and xs[100] < 1e-4
    assert abs(xs[10] - 1e-3) / 1e-3 < 1e-5
    # plain cosine does NOT restart
    ys = np.array([float(lr_at(s, kind="cosine", base_lr=1e-3,
                               total_steps=1000, warmup=10,
                               min_ratio=0.01)) for s in range(250)])
    assert ys[100] > ys[150] > ys[249]


def test_int8_fused_ce_recipe_golden():
    """The shipped 774M/1558M recipe (int8 fwd GEMMs + Pallas int8
    fused-CE, bf16 moments) pinned at tiny scale — interpret mode runs
    the REAL kernels on CPU. Two assertions:
    1. the int8 curve tracks the bf16 curve (quantization noise bound);
    2. absolute pins at rel_tol 1e-3 (regression tripwire — the int8
       recipe previously had NO quality pin anywhere, VERDICT r4 weak #3).
    """
    from koifish_tpu.ops.pallas import fused_ce as pfce

    card = ModelCard.from_arch(
        "GPT2", vocab_size=2048, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=4, head_dim=16, n_ffn=128, n_ctx=32, max_pos=32)

    def run(int8):
        tcard = TrainCard(batch=8, lr=0.01, warmup=5, optimizer="adamw",
                          seed=42, remat=False, moment_dtype="bf16",
                          int8_matmul=int8, int8_min_kn=0,
                          fused_ce=int8 or None)
        state = init_train_state(card, tcard)
        step = make_train_step(card, tcard, total_steps=40)
        key = jax.random.PRNGKey(0)
        losses = []
        for _ in range(8):
            key, k = jax.random.split(key)
            s = jax.random.randint(k, (8, 1), 0, 64)
            batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                     ].astype(jnp.int32)}
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        return losses

    pfce.set_interpret(True)
    try:
        li = run(True)
    finally:
        pfce.set_interpret(False)
    lb = run(False)
    # (1) noise bound: int8 fwd + int8 logits dots stay within 1% of bf16
    # at every step of the short curve (measured max rel diff 3.6e-4)
    for a, b in zip(li, lb):
        assert abs(a - b) / b < 0.01, (li, lb)
    # (2) pinned (CPU, jax 0.9.0, 2026-08-20): the recipe's own curve
    _check(li[0], 7.621432304382324)
    _check(li[7], 5.032386779785156)
