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


def test_lars_trust_ratio():
    """LARS semantics (GTensor::rLARS, reference GTensor.cpp:24-33):
    trust ratio = min(||w|| / (||g|| + eps), lars_ratio), >=2D leaves
    only; scales the gradient fed to the update."""
    from koifish_tpu.train.optimizer import (OptState, apply_updates,
                                             init_opt_state,
                                             lars_trust_ratio)
    p = jnp.ones((8, 8), jnp.float32)           # ||w|| = 8
    g = jnp.full((8, 8), 0.5, jnp.float32)      # ||g|| = 4
    r = float(lars_trust_ratio(p, g, lars_ratio=10.0))
    assert r == pytest.approx(2.0, rel=1e-5)    # 8/4, below the cap
    assert float(lars_trust_ratio(p, g, lars_ratio=1.5)) == 1.5  # capped

    # end-to-end: the scaled gradient is what feeds the moments (Adam's
    # normalized update is scale-invariant, so the moment is the witness)
    params = {"w": jnp.ones((64, 64), jnp.float32)}
    grads = {"w": jnp.full((64, 64), 1e-3, jnp.float32)}

    def first_moment(lars):
        opt = init_opt_state(params, "adamw")
        _, new_opt, _ = apply_updates(
            params, grads, opt, optimizer="adamw", lr=1e-2,
            weight_decay=0.0, grad_clip=1e9, lars_ratio=lars)
        return float(new_opt.m["w"].mean())

    base = first_moment(0.0)            # (1-beta1) * g
    capped = first_moment(0.01)         # ratio capped at 0.01
    assert capped == pytest.approx(base * 0.01, rel=1e-4)


def test_lars_config_parses():
    tc = TrainCard.from_json(
        {"optimization": {"method": "adamw", "lars_ratio": 2.5}})
    assert tc.lars_ratio == 2.5
    assert TrainCard().lars_ratio == 0.0


def test_lars_training_converges():
    card = _tiny_card()
    tc = TrainCard(batch=8, lr=1e-3, warmup=5, optimizer="adamw",
                   lars_ratio=4.0, remat=False)
    step = make_train_step(card, tc, total_steps=100)
    state = init_train_state(card, tc)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 33), 0, 128,
                              dtype=jnp.int32)
    losses = []
    for _ in range(30):
        state, m = step(state, {"tokens": toks})
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.8 * losses[0]


# ---------------------------------------------------------------------------
# stochastic rounding (reference CU_adamw_p's seeded SR, Optimizer.cu:135-393)
# ---------------------------------------------------------------------------

def test_stochastic_round_unbiased_and_exact():
    """E[sr(x)] == x, and exactly-representable values never move."""
    from koifish_tpu.train.optimizer import stochastic_round
    # x halfway-ish between bf16 neighbors 1.0 and 1.0078125
    x = jnp.full((20000,), 1.002, jnp.float32)
    out = stochastic_round(x, jax.random.PRNGKey(0), jnp.bfloat16)
    vals = set(float(v) for v in jnp.unique(out))
    assert vals <= {1.0, 1.0078125}
    mean = float(out.astype(jnp.float32).mean())
    assert abs(mean - 1.002) < 2e-4
    # representable: bit-exact passthrough
    y = jnp.array([1.0, -2.5, 0.0, 0.25], jnp.float32)
    out = stochastic_round(y, jax.random.PRNGKey(1), jnp.bfloat16)
    assert jnp.all(out.astype(jnp.float32) == y)
    # f32 target: plain cast
    out = stochastic_round(y, jax.random.PRNGKey(2), jnp.float32)
    assert out.dtype == jnp.float32 and jnp.all(out == y)


def test_sr_preserves_subulp_updates():
    """The capability RTN cannot have: a constant update stream of
    sub-half-ulp steps must move a bf16 parameter by ~the true sum in
    expectation. With round-to-nearest the parameter NEVER moves."""
    from koifish_tpu.train.optimizer import adamw_update
    p0 = jnp.full((512,), 1.0, jnp.bfloat16)   # ulp = 2^-8 ~ 3.9e-3
    g = jnp.full((512,), 1.0, jnp.float32)
    lr = 2e-4  # Adam update ~= lr << ulp/2
    kw = dict(lr=lr, beta1=0.9, beta2=0.95, eps=1e-8, weight_decay=0.0,
              decay_mask=False)
    # RTN: frozen forever
    p = p0
    m = v = jnp.zeros((512,), jnp.float32)
    for s in range(50):
        p, m, v, _ = adamw_update(p, g, m, v, step=s + 1, **kw)
    assert float(jnp.abs(p.astype(jnp.float32) - 1.0).max()) == 0.0
    # SR: drifts by ~= 50*lr (the true f32 trajectory) in expectation
    p = p0
    m = v = jnp.zeros((512,), jnp.float32)
    rng = jax.random.PRNGKey(7)
    for s in range(50):
        rng, sub = jax.random.split(rng)
        p, m, v, _ = adamw_update(p, g, m, v, step=s + 1, sr_rng=sub, **kw)
    drift = 1.0 - float(p.astype(jnp.float32).mean())
    # true update sum is slightly below 50*lr during warmup of mhat/vhat
    expect = 50 * lr
    assert 0.6 * expect < drift < 1.4 * expect, (drift, expect)


def test_sr_train_step_deterministic_and_on_by_default():
    """Same seed → identical SR trajectory (exact resume, the per-tensor
    persisted-seed analog of Fish.cpp:455); SR-off diverges from SR-on."""
    def run(sr):
        card = _tiny_card()
        tc = TrainCard(batch=8, lr=1e-3, warmup=5, optimizer="adamw",
                       stochastic_round=sr, remat=False)
        step = make_train_step(card, tc, total_steps=100)
        state = init_train_state(card, tc)
        toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 33), 0,
                                  128, dtype=jnp.int32)
        out = []
        for _ in range(10):
            state, m = step(state, {"tokens": toks})
            out.append(float(m["loss"]))
        return out
    a, b, off = run("auto"), run("auto"), run(False)
    assert a == b
    assert a != off          # bf16 params: SR visibly changes rounding


def test_sr_off_string_disables():
    """TrainCard(stochastic_round='off'/0/False) must all disable SR in
    the jitted step (the gate previously treated any non-False value —
    including the string 'off' — as enabled)."""
    def run(sr):
        card = _tiny_card()
        tc = TrainCard(batch=8, lr=1e-3, warmup=5, optimizer="adamw",
                       stochastic_round=sr, remat=False)
        step = make_train_step(card, tc, total_steps=100)
        state = init_train_state(card, tc)
        toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 33), 0,
                                  128, dtype=jnp.int32)
        out = []
        for _ in range(6):
            state, m = step(state, {"tokens": toks})
            out.append(float(m["loss"]))
        return out
    off_b, off_s, off_0 = run(False), run("off"), run(0)
    assert off_b == off_s == off_0
    assert run("auto") != off_b


# ---------------------------------------------------------------------------
# Muon Chebyshev orthogonalization (MUON_params_::Orthogonalization
# Chebyshev, CLI_params.hpp:570-574 — declared-only in the reference;
# working minimax-cubic schedule here)
# ---------------------------------------------------------------------------

def test_chebyshev_orth_matches_svd_polar():
    from koifish_tpu.train.optimizer import chebyshev_orth, newton_schulz
    G = jax.random.normal(jax.random.PRNGKey(3), (96, 64), jnp.float32)
    U, s, Vt = jnp.linalg.svd(G, full_matrices=False)
    exact = U @ Vt
    for Q, tol in ((chebyshev_orth(G), 0.05), (newton_schulz(G), 0.5)):
        assert Q.shape == G.shape
        err = jnp.max(jnp.abs(Q.T @ Q - jnp.eye(64)))
        assert float(err) < tol, f"orthogonality {float(err)}"
    # chebyshev lands closer to the exact polar factor than 5-step NS-bf16
    assert float(jnp.max(jnp.abs(chebyshev_orth(G) - exact))) < 0.05
    # wide orientation goes through the transpose path
    Qw = chebyshev_orth(G.T)
    assert float(jnp.max(jnp.abs(Qw @ Qw.T - jnp.eye(64)))) < 0.05


def test_chebyshev_schedule_contracts():
    from koifish_tpu.train.optimizer import _cheb_cubic_schedule
    import numpy as np
    xs = np.linspace(1e-3, 1.0, 4096)
    for a, b in _cheb_cubic_schedule(1e-3, 10):
        xs = a * xs + b * xs**3
    # every singular value in [l0, 1] is driven to 1 within 1e-4
    assert np.max(np.abs(xs - 1.0)) < 1e-4


def test_muon_chebyshev_trains():
    card = _tiny_card()
    tc = TrainCard(batch=8, lr=1e-3, warmup=5, optimizer="muon",
                   muon_ortho="chebyshev", remat=False)
    step = make_train_step(card, tc, total_steps=100)
    state = init_train_state(card, tc)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 8, 33), 0, 128,
                              dtype=jnp.int32)
    losses = []
    for _ in range(25):
        state, m = step(state, {"tokens": toks})
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.8 * losses[0]
    assert all(l == l for l in losses)  # no NaNs


def test_muon_ortho_unknown_rejected():
    from koifish_tpu.train.optimizer import muon_update
    p = jnp.ones((4, 4)); g = jnp.ones((4, 4)) * 0.1; m = jnp.zeros((4, 4))
    with pytest.raises(ValueError, match="muon_ortho"):
        muon_update(p, g, m, lr=1e-3, momentum=0.9, weight_decay=0.0,
                    ortho="gluon")
