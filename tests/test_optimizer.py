"""Optimizer-state options: bf16 moment storage (reference floatMV parity).

The reference stores Adam moments as bf16 (``floatMV = __nv_bfloat16``,
src/g_float.hpp:248; ``PIPE_Adamw<floatX, floatMV>`` Optimizer.cu:585) and
does the update math in f32 in-kernel. ``TrainCard.moment_dtype="bf16"``
is the analog — it halves optimizer HBM (the difference between
GPT2-1558M AdamW fitting in a 16 GB chip or not).
"""
import jax
import jax.numpy as jnp
import pytest

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.train.trainer import init_train_state, make_train_step


def _tiny_card():
    return ModelCard.from_arch(
        "GPT2", vocab_size=128, n_layer=2, n_embd=64, n_head=4, n_kv_head=4,
        head_dim=16, n_ffn=128, n_ctx=32, max_pos=32)


def _run(optimizer, moment_dtype, steps=30):
    card = _tiny_card()
    tc = TrainCard(batch=8, lr=1e-3, warmup=5, optimizer=optimizer,
                   moment_dtype=moment_dtype, remat=False)
    step = make_train_step(card, tc, total_steps=100)
    state = init_train_state(card, tc)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 33), 0, 128,
                              dtype=jnp.int32)
    losses = []
    for _ in range(steps):
        state, m = step(state, {"tokens": toks})
        losses.append(float(m["loss"]))
    return losses, state


@pytest.mark.parametrize("optimizer", ["adamw", "muon"])
def test_bf16_moments_converge_like_f32(optimizer):
    l32, s32 = _run(optimizer, "f32")
    l16, s16 = _run(optimizer, "bf16")
    # same trajectory within bf16 rounding (rel ~1e-2 by the last step)
    assert l16[0] == pytest.approx(l32[0], rel=1e-3)
    assert l16[-1] == pytest.approx(l32[-1], rel=2e-2)
    assert l16[-1] < 0.8 * l16[0]


def test_moment_storage_dtype():
    _, state = _run("adamw", "bf16", steps=2)
    m_leaves = jax.tree_util.tree_leaves(state.opt.m)
    big = [m for m in m_leaves if m.size > 0]
    assert big and all(m.dtype == jnp.bfloat16 for m in big)
    _, state = _run("adamw", "f32", steps=2)
    big = [m for m in jax.tree_util.tree_leaves(state.opt.m) if m.size > 0]
    assert big and all(m.dtype == jnp.float32 for m in big)


def test_config_parses_moment_dtype():
    tc = TrainCard.from_json({"optimization": {"method": "adamw",
                                               "moment_dtype": "BF16"}})
    assert tc.moment_dtype == "bf16"
