"""Native optimizers: AdamW and Muon (Newton–Schulz) with the reference's
stability guards.

TPU rebuild of the fused update pipes (``PIPE_Adamw``/``PIPE_Muon``,
reference: src/Device/Pipe.hpp:18-147, CUDA/Optimizer.cu:135-580):
- f32 optimizer math on bf16 parameter storage (CU_adamw_p semantics)
- global grad-norm clip before the update (GTensor::Dogleg,
  src/Manifold/Optimizer.cpp:310-371)
- per-element update spike guard ``T_spike`` (Pipe.hpp:42,
  Optimizer.cu:148-150) — updates larger than T_spike×lr are clamped and
  counted, feeding instability detection
- Muon: momentum → 5-iteration Newton–Schulz orthogonalization (on TPU
  this is just five jitted matmul pairs on the MXU) with RMS-matched lr
  scaling; non-2D params fall back to AdamW (reference Optimizer.cu:487-580)

All state is an ordinary pytree — shardable with the same PartitionSpecs
as the params (ZeRO-style optimizer sharding, SURVEY.md §2.7).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

T_SPIKE = 50.0  # reference Pipe.hpp:42


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OptState:
    m: Any                    # first moment / momentum (f32)
    v: Optional[Any]          # second moment (adamw) — None for pure muon
    step: jax.Array           # i32 scalar
    spikes: jax.Array         # i32 scalar — spike-guard trip count


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _real_grad(g) -> bool:
    """float0 (non-differentiable leaf) and empty stubs are not gradients."""
    return g is not None and getattr(g, "dtype", None) != jax.dtypes.float0 \
        and getattr(g, "size", 1) > 0


def global_norm(tree) -> jax.Array:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree) if _real_grad(x)]
    return jnp.sqrt(sum(leaves))


def clip_by_global_norm(grads, max_norm: float) -> Tuple[Any, jax.Array]:
    gnorm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return _tmap(lambda g: (g.astype(jnp.float32) * scale)
                 if _real_grad(g) else g, grads), gnorm


def _is_float(p) -> bool:
    return jnp.issubdtype(p.dtype, jnp.floating)


def _muon_leaf(p, optimizer: str, path: str = "") -> bool:
    """Leaves Muon orthogonalizes: 2D HIDDEN weight matrices. Embeddings,
    positional tables and the untied head stay on AdamW (the established
    Muon recipe — orthogonalizing the embedding basis hurts; the
    reference's PIPE_Muon likewise only touches layer weights,
    Optimizer.cu:487). Must match the dispatch in apply_updates."""
    if optimizer != "muon" or getattr(p, "ndim", 0) != 2 \
            or p.shape[0] < 64 or p.shape[1] < 64:
        return False
    leaf = path.rsplit(".", 1)[-1]
    return leaf not in ("wte", "wpe", "head")


def init_opt_state(params, optimizer: str = "adamw",
                   moment_dtype: str = "f32") -> OptState:
    """Moments for float leaves only (integer leaves — e.g. packed QTensor
    codes under gama training — are frozen, stored as size-0 stubs).
    Muon-handled leaves carry no second moment (the reference's PIPE_Muon
    keeps only momentum, Optimizer.cu:487-580) — a size-0 stub instead of
    a dead params-sized f32 buffer.

    ``moment_dtype``: moment STORAGE dtype — update math is always f32
    (adamw_update upcasts). "bf16" matches the reference's floatMV
    (g_float.hpp:248, PIPE_Adamw<floatX, floatMV>) and halves optimizer
    HBM — the difference between GPT2-1558M AdamW fitting in 16 GB or
    not."""
    mdt = jnp.bfloat16 if moment_dtype == "bf16" else jnp.float32

    def zeros(p):
        if not _is_float(p):
            return jnp.zeros((0,), jnp.float32)
        return jnp.zeros(p.shape, mdt)

    def zeros_v(kp, p):
        path = ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        if not _is_float(p) or _muon_leaf(p, optimizer, path):
            return jnp.zeros((0,), jnp.float32)
        return jnp.zeros(p.shape, mdt)
    m = _tmap(zeros, params)
    v = jax.tree_util.tree_map_with_path(zeros_v, params)
    return OptState(m=m, v=v, step=jnp.zeros((), jnp.int32),
                    spikes=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# stochastic rounding — f32 math onto bf16 storage without losing
# sub-half-ulp updates
# ---------------------------------------------------------------------------

def stochastic_round(x: jax.Array, rng: jax.Array, out_dtype) -> jax.Array:
    """Round f32 ``x`` to ``out_dtype`` stochastically when that dtype is
    bf16 (plain cast otherwise).

    The reference's fused AdamW does f32 math and writes bf16 parameter /
    moment storage with a per-tensor stochastic-rounding seed
    (``CU_adamw_p``, reference Optimizer.cu:135-393; seeds persisted per
    tensor, Fish.cpp:455). Deterministic round-to-nearest systematically
    drops every update smaller than half a ulp of the stored value — at
    bf16 (8 mantissa bits) that is any relative step below ~2^-9, a known
    long-run quality loss. SR preserves the update in expectation:
    E[round(x)] == x exactly.

    Mechanism: add a uniform 16-bit integer to the f32 bit pattern and
    truncate to the high 16 bits (= bf16). The carry into the kept bits
    fires with probability equal to the discarded fraction, for any sign
    or magnitude (IEEE bit patterns are monotone in magnitude).

    The random bits come from a murmur3-finalizer hash of (element
    index ^ per-leaf seed) — ~6 VPU integer ops/element — NOT from
    threefry (`jax.random.bits` measured ~7% of a GPT2-774M step when
    SR defaulted on: three param-sized threefry sweeps per step). The
    reference's CU_adamw_p likewise uses a cheap seeded per-element
    generator, not a crypto PRNG (Optimizer.cu:135-393). SR only needs
    uniform low-16 bits; the finalizer is a full avalanche permutation
    (statistical mean-preservation pinned in test_optimizer)."""
    if out_dtype != jnp.bfloat16:
        return x.astype(out_dtype)
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    seed = jax.random.bits(rng, (), jnp.uint32)      # one scalar threefry
    n = x.size
    idx = jax.lax.iota(jnp.uint32, n).reshape(x.shape)
    h = idx ^ seed
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    hi = ((bits + (h & jnp.uint32(0xFFFF))) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def _store(x: jax.Array, dtype, rng: Optional[jax.Array], tag: int
           ) -> jax.Array:
    """Writeback to storage ``dtype``: stochastic when an SR rng is given
    (one independent stream per (leaf, tensor-role) via ``tag``)."""
    if rng is None or dtype == x.dtype:
        return x.astype(dtype)
    return stochastic_round(x, jax.random.fold_in(rng, tag), dtype)


# ---------------------------------------------------------------------------
# AdamW
# ---------------------------------------------------------------------------

def adamw_update(p, g, m, v, *, lr, beta1, beta2, eps, weight_decay, step,
                 decay_mask=True, sr_rng=None):
    mdt, vdt = m.dtype, v.dtype            # storage dtypes (f32 or bf16)
    pf = p.astype(jnp.float32)
    m = beta1 * m.astype(jnp.float32) + (1 - beta1) * g
    v = beta2 * v.astype(jnp.float32) + (1 - beta2) * jnp.square(g)
    mhat = m / (1 - beta1 ** step)
    vhat = v / (1 - beta2 ** step)
    upd = mhat / (jnp.sqrt(vhat) + eps)
    # spike guard (T_spike): clamp runaway per-element updates
    spiked = jnp.abs(upd) > T_SPIKE
    upd = jnp.clip(upd, -T_SPIKE, T_SPIKE)
    if decay_mask:
        upd = upd + weight_decay * pf
    new_p = _store(pf - lr * upd, p.dtype, sr_rng, 0)
    return new_p, _store(m, mdt, sr_rng, 1), _store(v, vdt, sr_rng, 2), \
        jnp.sum(spiked, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Muon — Newton–Schulz orthogonalization
# ---------------------------------------------------------------------------

_NS_COEFFS = (3.4445, -4.7750, 2.0315)  # quintic NS iteration coefficients


def newton_schulz(G: jax.Array, steps: int = 5) -> jax.Array:
    """Approximate UV^T of G's SVD via odd-polynomial iteration — five
    matmul pairs on the MXU (reference PIPE_Muon::CU_core does the same
    with in-kernel GEMMs, Optimizer.cu:487-580)."""
    a, b, c = _NS_COEFFS
    X = G.astype(jnp.bfloat16)
    transposed = X.shape[0] > X.shape[1]
    if transposed:
        X = X.T
    X = X / (jnp.linalg.norm(X.astype(jnp.float32)) + 1e-7).astype(jnp.bfloat16)
    for _ in range(steps):
        A = X @ X.T
        B = b * A + c * (A @ A)
        X = a * X + B @ X
    if transposed:
        X = X.T
    return X.astype(jnp.float32)


def _cheb_cubic_schedule(l0: float = 1e-3, steps: int = 10):
    """Minimax (Chebyshev-equioscillation) cubic coefficient schedule for
    the sign/polar iteration — the acceleration the reference's MUON card
    names `Chebyshev` (CLI_params.hpp:570-574, citing
    GrishKate/accelerating_orthogonalization; the enum is never dispatched
    by any CUDA kernel there — this is the working version).

    Per step, over the current singular-value interval [l, u], the odd
    cubic p(x) = a·x + b·x³ with the smallest worst-case error to 1 is
    fixed by equioscillation: p(l) = p(u) = 1−E and p(x*) = 1+E at the
    interior maximum x* = sqrt(s/3), s = l²+lu+u². Solving gives
    |b| = 2 / (l(lu+u²) + (2s/3)·sqrt(s/3)), a = |b|·s, and the next
    interval [1−E, 1+E]. σ < l still contract toward 1: p(x)/x ≥ (1−E)/l
    > 1 there, so the floor l0 is a tuning knob, not a validity bound.
    Coefficients are Python floats — static under jit."""
    import math
    coeffs, l, u = [], l0, 1.0
    for _ in range(steps):
        s = l * l + l * u + u * u
        babs = 2.0 / (l * (l * u + u * u) + (2.0 * s / 3.0) * math.sqrt(s / 3.0))
        E = 1.0 - babs * l * (l * u + u * u)
        coeffs.append((babs * s, -babs))
        l, u = 1.0 - E, 1.0 + E
    return coeffs


def chebyshev_orth(G: jax.Array, steps: int = 10, l0: float = 1e-3) -> jax.Array:
    """UV^T via the Chebyshev-accelerated cubic iteration: 2 matmuls/step
    (vs Newton–Schulz's 3) with per-step minimax coefficients instead of a
    fixed quintic — 10 steps drive every σ ∈ [l0, 1] to within 4e-6 of 1
    (E contracts quadratically once E < 1). Runs in f32 (non-default path;
    accuracy over the last half-ulp matters more than MXU rate here)."""
    X = G.astype(jnp.float32)
    transposed = X.shape[0] > X.shape[1]
    if transposed:
        X = X.T
    X = X / (jnp.linalg.norm(X) + 1e-7)
    for a, b in _cheb_cubic_schedule(l0, steps):
        X = a * X + b * ((X @ X.T) @ X)
    if transposed:
        X = X.T
    return X


def muon_update(p, g, mom, *, lr, momentum, weight_decay, sr_rng=None,
                ortho: str = "ns"):
    mdt = mom.dtype
    pf = p.astype(jnp.float32)
    mom = momentum * mom.astype(jnp.float32) + g
    if ortho not in ("ns", "chebyshev"):
        raise ValueError(f"muon_ortho={ortho!r}: 'ns' or 'chebyshev' "
                         "('gluon' is declared-only in the reference too)")
    orth = chebyshev_orth if ortho == "chebyshev" else newton_schulz
    u = orth(momentum * mom + g)  # nesterov-style lookahead
    # RMS-match: scale so the update's RMS is comparable to AdamW's
    u = u * (0.2 * (max(p.shape[0], p.shape[-1]) ** 0.5))
    # spike guard (T_spike, Pipe.hpp:42) — same protection as the AdamW pipe
    spiked = jnp.abs(u) > T_SPIKE
    u = jnp.clip(u, -T_SPIKE, T_SPIKE)
    new_p = _store(pf - lr * (u + weight_decay * pf), p.dtype, sr_rng, 0)
    return new_p, _store(mom, mdt, sr_rng, 1), jnp.sum(spiked,
                                                       dtype=jnp.int32)


# ---------------------------------------------------------------------------
# combined apply
# ---------------------------------------------------------------------------

def lars_trust_ratio(p, g, lars_ratio: float) -> jax.Array:
    """LARS per-tensor trust ratio (GTensor::rLARS, reference
    GTensor.cpp:24-33; applied as the grad scale in Optimizer.cpp:338-341
    when config.lars_ratio > 0): min(||w|| / (||g|| + 1e-8), lars_ratio).
    The reference skips <=1D tensors (biases/norms)."""
    wnorm = jnp.linalg.norm(p.astype(jnp.float32))
    gnorm = jnp.linalg.norm(g.astype(jnp.float32))
    return jnp.minimum(wnorm / (gnorm + 1e-8), lars_ratio)


def apply_updates(params, grads, opt: OptState, *, optimizer: str, lr,
                  beta1=0.9, beta2=0.95, eps=1e-8, weight_decay=0.1,
                  muon_momentum=0.95, grad_clip=1.0, lars_ratio=0.0,
                  muon_ortho="ns", sr_rng=None,
                  ) -> Tuple[Any, OptState, Dict[str, jax.Array]]:
    """One optimizer step over the whole param pytree (grads already
    averaged). Returns (params, opt_state, metrics).

    ``sr_rng``: per-step rng → stochastic rounding on every bf16-storage
    writeback (params AND moments), one independent stream per leaf
    (fold_in by flat index — the reference persists per-tensor seeds,
    Fish.cpp:455; deriving them from the step rng keeps resume exact).
    None → deterministic round-to-nearest."""
    grads, gnorm = clip_by_global_norm(grads, grad_clip)
    step = opt.step + 1
    spikes = jnp.zeros((), jnp.int32)

    pl_, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in kp) for kp, _ in pl_]
    p_leaves = [leaf for _, leaf in pl_]
    g_leaves = treedef.flatten_up_to(grads)
    m_leaves = treedef.flatten_up_to(opt.m)
    v_leaves = treedef.flatten_up_to(opt.v) if opt.v is not None else [None] * len(p_leaves)

    new_p, new_m, new_v = [], [], []
    for i, (path, p, g, m, v) in enumerate(zip(paths, p_leaves, g_leaves,
                                               m_leaves, v_leaves)):
        if not _is_float(p) or not _real_grad(g):
            # frozen leaf (int codes, masked grads): pass through untouched
            new_p.append(p)
            new_m.append(m)
            new_v.append(v)
            continue
        leaf_rng = (jax.random.fold_in(sr_rng, i)
                    if sr_rng is not None else None)
        use_muon = _muon_leaf(p, optimizer, path)
        decay = p.ndim >= 2  # no weight decay on norms/biases
        if lars_ratio > 0.0 and p.ndim >= 2:
            g = g * lars_trust_ratio(p, g, lars_ratio)
        if use_muon:
            np_, nm, sp = muon_update(
                p, g, m, lr=lr, momentum=muon_momentum,
                weight_decay=weight_decay if decay else 0.0,
                sr_rng=leaf_rng, ortho=muon_ortho)
            spikes = spikes + sp
            nv = v
        else:
            np_, nm, nv, sp = adamw_update(
                p, g, m, v, lr=lr, beta1=beta1, beta2=beta2, eps=eps,
                weight_decay=weight_decay if decay else 0.0, step=step,
                sr_rng=leaf_rng)
            spikes = spikes + sp
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)

    params = jax.tree_util.tree_unflatten(treedef, new_p)
    m = jax.tree_util.tree_unflatten(treedef, new_m)
    v = jax.tree_util.tree_unflatten(treedef, new_v) if opt.v is not None else None
    metrics = {"grad_norm": gnorm, "spikes": spikes}
    return params, OptState(m=m, v=v, step=step, spikes=opt.spikes + spikes), metrics
