"""Flash attention (fwd + bwd) — Pallas TPU kernels.

Replaces the reference's cuDNN flash-attention graphs (src/Device/CUDA/
QKV.cu:130-313, fwd+bwd cached per shape). Online-softmax blocked
attention with GQA, causal masking (+ sliding window); backward is the
flash recipe using the forward's logsumexp — memory stays O(T).

TPU-specific design (round-2 overhaul, from xprof device traces):

- All s = q·kᵀ dots run with **bf16 operands** (f32 accumulate): f32
  operands would run the MXU at ~1/3 rate and dominated the round-1
  kernel's time.
- lse / delta travel as **[bh, t, 1] column arrays** (block
  (1, BQ, 1) — lane dim 1 equals the array dim, so Mosaic accepts it
  and `ref[0]` yields the (BQ, 1) column natively) instead of the
  round-1 [bh, t, 128] lane-broadcast arrays, which cost ~200 MB of
  HBM traffic per layer-backward.
- GQA is handled by **index maps** (kv block index = q head // group):
  no jnp.repeat materialization of K/V per q-head.
- When the whole sequence fits one tile (t == BQ == BK, the ≤1024-ctx
  training config) the backward collapses to **one fused kernel**
  computing dq, dk, dv in a single pass — 5 MXU dots instead of the
  two-sweep recipe's 7 (s and dp are not recomputed).
- Kernels write bf16 grads directly (the cast was a separate XLA pass
  in round 1); dk/dv accumulate over the q-group in-kernel.

Falls back to None (caller uses the XLA path) when shapes don't qualify.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# preferred tiles, shrunk per shape by _tiles(); 1024x1024 measured fastest
# on v5e for the GPT2-124M train step. See docs/DESIGN.md. Env overrides
# exist for on-chip tile sweeps (prof_step.py / tools/sweep_big.py).
import os as _os
BQ = int(_os.environ.get("KOIFISH_FLASH_BQ", 1024))
BK = int(_os.environ.get("KOIFISH_FLASH_BK", 1024))
# strip rows for the single-tile strip-tiled kernels (256 measured best
# at 774M; env knob for sweeps)
QS_ROWS = int(_os.environ.get("KOIFISH_FLASH_QS", 256))


def _tiles(t: int):
    """Largest preferred tile sizes that divide the sequence length."""
    bq = next((c for c in (BQ, 512, 256, 128) if t % c == 0), None)
    bk = next((c for c in (BK, 512, 256, 128) if t % c == 0), None)
    return bq, bk


_INTERPRET = False  # set_interpret(True): run kernels in interpreter mode


def set_interpret(on: bool) -> None:
    """Force kernels eligible + interpreted (CPU testing of kernel logic)."""
    global _INTERPRET
    _INTERPRET = on


def _platform_is_tpu() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _eligible(q, k, window: int) -> bool:
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    bq, bk = _tiles(tq)
    return (
        _platform_is_tpu()
        and tq == tk                      # self-attention training/prefill
        and bq is not None and bk is not None
        and d in (64, 128, 256)
        and hq % hkv == 0
        and window >= 0        # sliding window supported in-kernel
        # value head dim must match qk head dim (GAU gates F/H-wide
        # values; MLA dv≠d also takes the XLA path)
    )


def _col_cfg(hq: int, hkv: int, d: int) -> Optional[tuple]:
    """Heads-per-block config for the transpose-free column path.

    Returns (hb, hbk, g) — q-heads and kv-heads per block — or None when
    the shape can't keep Mosaic's 128-lane block rule AND single-program
    kv-head ownership (g | hb). hb*d targets 256 lanes (512-byte DMA
    rows measured fastest on v5e; 128-byte rows ran 19% slower)."""
    g = hq // hkv
    for hb in (256 // d if d <= 256 else 1, 128 // d, 1):
        if hb < 1 or hq % hb or (hb * d) % 128:
            continue
        if g <= hb and hb % g == 0 and ((hb // g) * d) % 128 == 0:
            return hb, hb // g, g
    return None


def flash_attention_or_none(q, k, v, *, scale: float, window: int = 0
                            ) -> Optional[jax.Array]:
    """Differentiable causal flash attention (Pallas fwd + bwd kernels)."""
    from koifish_tpu.utils import kernel_log
    if not _eligible(q, k, window) or v.shape[-1] != q.shape[-1]:
        kernel_log.fallback(
            "flash_attention",
            f"q{tuple(q.shape)} k{tuple(k.shape)} dv={v.shape[-1]} "
            f"window={window}: need tq==tk, d in (64,128,256), dv==d, "
            f"hq%hkv==0, window>=0, T tile-able")
        return None
    b, t, hq, d = q.shape
    if _col_cfg(hq, k.shape[2], d) is not None:
        kernel_log.choice("flash_attention",
                          f"column path q{tuple(q.shape)} window={window}")
        # transpose-free path: kernels consume the QKV projection's
        # native [B, T, H*D] layout via column BlockSpecs — the
        # [B,T,H,D]<->[B,H,T,D] relayout copies (96 per GPT2 step,
        # ~25 MB each) disappear from the HLO entirely.
        out = _flash_cols_diff(q.reshape(b, t, hq * d),
                               k.reshape(b, t, -1), v.reshape(b, t, -1),
                               hq, scale, window)
        return out.reshape(b, t, hq, d)
    kernel_log.choice("flash_attention",
                      f"head-major path q{tuple(q.shape)} window={window}")
    return _flash_diff(q, k, v, scale, window)


# ---------------------------------------------------------------------------
# layout: [B, T, H, D] -> [B*H, T, D]; KV heads stay unexpanded — kernels
# map q-head h to kv block h // g via the BlockSpec index maps.
# ---------------------------------------------------------------------------

def _head_major(x):
    b, t, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_diff(q, k, v, scale, window):
    out, _ = _flash_fwd_call(_head_major(q), _head_major(k), _head_major(v),
                             g=q.shape[2] // k.shape[2], scale=scale,
                             window=window)
    b, t, hq, d = q.shape
    return out.reshape(b, hq, t, d).transpose(0, 2, 1, 3)


def _flash_diff_fwd(q, k, v, scale, window):
    qh, kh, vh = _head_major(q), _head_major(k), _head_major(v)
    out, lse = _flash_fwd_call(qh, kh, vh, g=q.shape[2] // k.shape[2],
                               scale=scale, window=window)
    b, t, hq, d = q.shape
    o4 = out.reshape(b, hq, t, d).transpose(0, 2, 1, 3)
    return o4, (qh, kh, vh, out, lse, q.shape, k.shape[2])


def _flash_diff_bwd(scale, window, res, g):
    qh, kh, vh, out, lse, qshape, hkv = res
    b, t, hq, d = qshape
    gh = _head_major(g)
    dq, dk, dv = _flash_bwd_call(qh, kh, vh, out, lse, gh, hkv=hkv,
                                 scale=scale, window=window)
    dq4 = dq.reshape(b, hq, t, d).transpose(0, 2, 1, 3)
    dk4 = dk.reshape(b, hkv, t, d).transpose(0, 2, 1, 3)
    dv4 = dv.reshape(b, hkv, t, d).transpose(0, 2, 1, 3)
    return dq4, dk4, dv4


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("g", "scale", "window"))
def _flash_fwd_call(qh, kh, vh, *, g: int, scale: float, window: int = 0):
    bh, t, d = qh.shape
    bq, bk = _tiles(t)
    if t == bq == bk and t % min(QS_ROWS, t) == 0:
        # strip-tiled direct-softmax single-tile path (see the cols
        # variant) — this head-major route serves head counts the
        # column layout can't 128-lane-align (e.g. GPT2-1558M's H=25)
        return _fwd_single(qh, kh, vh, g=g, scale=scale, window=window,
                           t=t, d=d)
    grid = (bh, t // bq, t // bk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, BQ=bq, BK=bk,
                          window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h // g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h // g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), qh.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),  # logsumexp cols
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * t * t * d,
            bytes_accessed=4 * bh * t * d * 2,
            transcendentals=bh * t * t // 2,
        ),
    )(qh, kh, vh)
    return out, lse


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, o_acc, m_acc, l_acc,
                *, scale, BQ, BK, window=0):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[:] = jnp.zeros_like(l_acc)

    # tile live iff some (qpos, kpos) pair passes causal (+window) masks
    live = j * BK <= i * BQ + (BQ - 1)
    if window > 0:
        live = jnp.logical_and(live, (j + 1) * BK > i * BQ - window)

    @pl.when(live)
    def _():
        # bf16 operands: f32 operands run the MXU at ~1/3 rate
        qb = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
        s = jnp.dot(qb, k_ref[0].T, preferred_element_type=jnp.float32)
        qpos = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        kpos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        s = jnp.where(allowed, s, _NEG_INF)

        m_prev = m_acc[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_acc[:] = l_acc[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_acc[:] = o_acc[:] * alpha + jnp.dot(
            p.astype(jnp.bfloat16), v_ref[0],
            preferred_element_type=jnp.float32)
        m_acc[:] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        l = jnp.maximum(l_acc[:], 1e-30)
        o_ref[0] = (o_acc[:] / l).astype(o_ref.dtype)
        lse_ref[0] = m_acc[:] + jnp.log(l)


def _fwd_single(qh, kh, vh, *, g, scale, window, t, d):
    """Head-major single-tile forward: grid (bh,), strip-tiled direct
    softmax with static causal K extents."""
    bh = qh.shape[0]
    out, lse = pl.pallas_call(
        functools.partial(_fwd_single_kernel, scale=scale, T=t,
                          window=window),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda h: (h // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda h: (h // g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t, d), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), qh.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * t * t * d,
            bytes_accessed=4 * bh * t * d * 2,
            transcendentals=bh * t * t // 2,
        ),
    )(qh, kh, vh)
    return out, lse


def _fwd_single_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                       *, scale, T, window=0):
    qb, kb, vb = q_ref[0], k_ref[0], v_ref[0]
    QS = min(QS_ROWS, T)
    ql = (qb.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    o_s, lse_s = [], []
    for q0 in range(0, T, QS):
        ext = q0 + QS                       # static causal K extent
        qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        s = jnp.dot(ql[q0:ext], kb[:ext].T,
                    preferred_element_type=jnp.float32)       # [QS, ext]
        s = jnp.where(allowed, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        o_s.append(jnp.dot(p.astype(jnp.bfloat16), vb[:ext],
                           preferred_element_type=jnp.float32) / l)
        lse_s.append(m + jnp.log(l))
    o_ref[0] = jnp.concatenate(o_s, axis=0).astype(o_ref.dtype)
    lse_ref[0] = jnp.concatenate(lse_s, axis=0)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("hkv", "scale", "window"))
def _flash_bwd_call(qh, kh, vh, out, lse, gh, *, hkv: int, scale: float,
                    window: int = 0):
    bh, t, d = qh.shape
    bq, bk = _tiles(t)
    g = qh.shape[0] // kh.shape[0]
    # delta = rowsum(dO ∘ O) is recomputed inside the kernels from the
    # dO and O tiles: materializing it as a [bh,t,1] array costs a
    # {1,0,2}->{2,1,0} relayout copy at every pallas boundary (~0.3 ms
    # each on v5e — XLA won't no-op the degenerate-dim relayout).
    if t == bq == bk and t % min(QS_ROWS, t) == 0:
        return _bwd_fused(qh, kh, vh, gh, out, lse, g=g, scale=scale,
                          window=window, d=d, t=t)
    return _bwd_twopass(qh, kh, vh, gh, out, lse, g=g, scale=scale,
                        window=window, bq=bq, bk=bk)


def _bwd_fused(qh, kh, vh, gh, out, lse, *, g, scale, window, d, t):
    """One kernel, whole sequence in VMEM: dq,dk,dv in a single pass.

    Grid (b·hkv, g): the group dim is sequential, dk/dv accumulate over
    it in scratch; dq is written per q-head. 5 MXU dots (vs 7 for the
    two-sweep recipe: s and dp are shared between the dk/dv and dq
    halves).
    """
    bh, _, _ = qh.shape
    bkv = kh.shape[0]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, T=t,
                          window=window),
        grid=(bkv, g),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda h, gi: (h * g + gi, 0, 0),
                         memory_space=pltpu.VMEM),                 # q
            pl.BlockSpec((1, t, d), lambda h, gi: (h, 0, 0),
                         memory_space=pltpu.VMEM),                 # k
            pl.BlockSpec((1, t, d), lambda h, gi: (h, 0, 0),
                         memory_space=pltpu.VMEM),                 # v
            pl.BlockSpec((1, t, d), lambda h, gi: (h * g + gi, 0, 0),
                         memory_space=pltpu.VMEM),                 # dO
            pl.BlockSpec((1, t, d), lambda h, gi: (h * g + gi, 0, 0),
                         memory_space=pltpu.VMEM),                 # O
            pl.BlockSpec((1, t, 1), lambda h, gi: (h * g + gi, 0, 0),
                         memory_space=pltpu.VMEM),                 # lse
        ],
        out_specs=(
            pl.BlockSpec((1, t, d), lambda h, gi: (h * g + gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda h, gi: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda h, gi: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((bkv, t, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((bkv, t, d), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.float32),   # dk accum over group
            pltpu.VMEM((t, d), jnp.float32),   # dv accum over group
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * t * t * d,
            bytes_accessed=8 * bh * t * d * 2,
            transcendentals=bh * t * t,
        ),
    )(qh, kh, vh, gh, out, lse)
    return dq, dk, dv


def _bwd_fused_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                      *, scale, T, window=0):
    gi = pl.program_id(1)

    @pl.when(gi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    gb = g_ref[0]
    ob = o_ref[0]
    lse_b = lse_ref[0]
    qs = (qb.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    # strip-tiled with static causal K extents (see _bwd_cols_fused_kernel)
    QS = min(QS_ROWS, T)
    n_strips = T // QS
    dq_s = []
    segs_k = [None] * n_strips
    segs_v = [None] * n_strips
    for q0 in range(0, T, QS):
        ext = q0 + QS
        qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        s = jnp.dot(qs[q0:ext], kb[:ext].T,
                    preferred_element_type=jnp.float32)        # [QS, ext]
        s = jnp.where(allowed, s, _NEG_INF)
        p = jnp.exp(s - lse_b[q0:ext])
        pb = p.astype(jnp.bfloat16)
        gs = gb[q0:ext]
        dv_part = jax.lax.dot_general(
            pb, gs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [ext, D]
        dp = jnp.dot(gs, vb[:ext].T, preferred_element_type=jnp.float32)
        delta = jnp.sum(gs.astype(jnp.float32) *
                        ob[q0:ext].astype(jnp.float32),
                        axis=-1, keepdims=True)                # [QS, 1]
        ds = p * (dp - delta) * scale
        dsb = ds.astype(jnp.bfloat16)
        dk_part = jax.lax.dot_general(
            dsb, qb[q0:ext], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [ext, D]
        for si in range(ext // QS):
            pk = dk_part[si * QS:(si + 1) * QS]
            pv = dv_part[si * QS:(si + 1) * QS]
            segs_k[si] = pk if segs_k[si] is None else segs_k[si] + pk
            segs_v[si] = pv if segs_v[si] is None else segs_v[si] + pv
        dq_s.append(jnp.dot(dsb, kb[:ext],
                            preferred_element_type=jnp.float32))
    dv_acc[:] += jnp.concatenate(segs_v, axis=0)
    dk_acc[:] += jnp.concatenate(segs_k, axis=0)
    dq_ref[0] = jnp.concatenate(dq_s, axis=0).astype(dq_ref.dtype)

    @pl.when(gi == pl.num_programs(1) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_twopass(qh, kh, vh, gh, out, lse, *, g, scale, window, bq, bk):
    """General path (t > max tile): dK/dV sweep + dQ sweep."""
    bh, t, d = qh.shape
    bkv = kh.shape[0]

    # --- dK/dV sweep: grid over kv heads x kv tiles; (q tile, group)
    # sequential — dk/dv accumulate across both ------------------------
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, BQ=bq, BK=bk,
                          G=g, window=window),
        grid=(bkv, t // bk, (t // bq) * g),
        in_specs=[
            pl.BlockSpec((1, bq, d), functools.partial(_q_map, g=g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, j, ig: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, j, ig: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), functools.partial(_q_map, g=g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), functools.partial(_q_map, g=g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), functools.partial(_r_map, g=g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda h, j, ig: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, j, ig: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bkv, t, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((bkv, t, d), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(qh, kh, vh, gh, out, lse)

    # --- dQ sweep: grid over q heads x q tiles, kv tiles sequential ----
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, BQ=bq, BK=bk,
                          window=window),
        grid=(bh, t // bq, t // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d),
                         functools.partial(_kv_map, g=g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), functools.partial(_kv_map, g=g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(qh, kh, vh, gh, out, lse)
    return dq, dk, dv


def _q_map(h, j, ig, *, g):
    """q/dO block for the dkv sweep: kv head h, group member ig%g,
    q tile ig//g."""
    return (h * g + ig % g, ig // g, 0)


def _r_map(h, j, ig, *, g):
    """lse column block for the dkv sweep."""
    return (h * g + ig % g, ig // g, 0)


def _kv_map(h, i, j, *, g):
    """k/v block for the dq sweep: q head h -> kv head h // g."""
    return (h // g, j, 0)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale, BQ, BK, G,
                    window=0):
    j = pl.program_id(1)            # kv tile (parallel)
    ig = pl.program_id(2)           # (q tile, group member) sequential
    i = ig // G

    @pl.when(ig == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    live = i * BQ + (BQ - 1) >= j * BK
    if window > 0:
        live = jnp.logical_and(live, (j + 1) * BK > i * BQ - window)

    @pl.when(live)
    def _():
        qb = q_ref[0]
        kb = k_ref[0]
        qs = (qb.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        s = jnp.dot(qs, kb.T, preferred_element_type=jnp.float32)
        qpos = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        kpos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        s = jnp.where(allowed, s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0])                        # [BQ, BK]
        gb = g_ref[0]
        dv_acc[:] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jnp.dot(gb, v_ref[0].T, preferred_element_type=jnp.float32)
        delta = jnp.sum(gb.astype(jnp.float32) *
                        o_ref[0].astype(jnp.float32), axis=-1,
                        keepdims=True)
        ds = p * (dp - delta) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ig == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                   dq_ref, dq_acc, *, scale, BQ, BK, window=0):
    i = pl.program_id(1)   # q tile (parallel)
    j = pl.program_id(2)   # kv tile (sequential)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    live = j * BK <= i * BQ + (BQ - 1)
    if window > 0:
        live = jnp.logical_and(live, (j + 1) * BK > i * BQ - window)

    @pl.when(live)
    def _():
        qb = q_ref[0]
        kb = k_ref[0]
        qs = (qb.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        s = jnp.dot(qs, kb.T, preferred_element_type=jnp.float32)
        qpos = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        kpos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        s = jnp.where(allowed, s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0])
        gb = g_ref[0]
        dp = jnp.dot(gb, v_ref[0].T, preferred_element_type=jnp.float32)
        delta = jnp.sum(gb.astype(jnp.float32) *
                        o_ref[0].astype(jnp.float32), axis=-1,
                        keepdims=True)
        ds = p * (dp - delta) * scale
        dq_acc[:] += jnp.dot(ds.astype(jnp.bfloat16), kb,
                             preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# column-native path: kernels consume [B, T, H*D] directly
# ---------------------------------------------------------------------------
# The head-major path above must materialize [B,T,H,D] -> [B,H,T,D]
# relayout copies at every pallas boundary (q,k,v,out fwd + dO,dq,dk,dv
# bwd = 8 copies x ~25 MB per GPT2 layer-step). Here the BlockSpecs cut
# (tile, HB*D) column windows straight out of the projection output:
# grid dim 0 enumerates (batch, head-group); per-head work inside the
# kernel uses static lane slices. lse lives as [B, G, T, HB] so its
# block's last dim equals the array dim (Mosaic's small-lane rule).
# Ownership invariant (_col_cfg): every kv head's full q-group sits in
# one program (g | HB), so dk/dv accumulate in-program - no cross-program
# reduction, and the fused single-tile backward needs no scratch at all.

def _cols_map(G):
    return lambda bg, i, j: (bg // G, i, bg % G)


def _cols_map_j(G):
    return lambda bg, i, j: (bg // G, j, bg % G)


def _lse_map(G):
    return lambda bg, i, j: (bg // G, bg % G, i, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_cols_diff(qc, kc, vc, hq, scale, window):
    out, _ = _flash_cols_fwd_call(qc, kc, vc, hq=hq, scale=scale,
                                  window=window)
    return out


def _flash_cols_diff_fwd(qc, kc, vc, hq, scale, window):
    out, lse = _flash_cols_fwd_call(qc, kc, vc, hq=hq, scale=scale,
                                    window=window)
    return out, (qc, kc, vc, out, lse)


def _flash_cols_diff_bwd(hq, scale, window, res, g):
    qc, kc, vc, out, lse = res
    return _flash_cols_bwd_call(qc, kc, vc, out, lse, g, hq=hq,
                                scale=scale, window=window)


_flash_cols_diff.defvjp(_flash_cols_diff_fwd, _flash_cols_diff_bwd)


@functools.partial(jax.jit, static_argnames=("hq", "scale", "window"))
def _flash_cols_fwd_call(qc, kc, vc, *, hq: int, scale: float,
                         window: int = 0):
    b, t, hqd = qc.shape
    d = hqd // hq
    hkv = kc.shape[2] // d
    hb, hbk, g = _col_cfg(hq, hkv, d)
    G = hq // hb
    bq, bk = _tiles(t)
    if t == bq == bk and t % min(QS_ROWS, t) == 0:
        # whole sequence in one program: strip-tiled direct softmax
        # (static causal K extents; no online-softmax accumulators)
        return _fwd_cols_single(qc, kc, vc, hb=hb, hbk=hbk, g=g, d=d,
                                G=G, scale=scale, window=window, t=t)
    grid = (b * G, t // bq, t // bk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_cols_kernel, scale=scale, BQ=bq, BK=bk,
                          HB=hb, D=d, GQ=g, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hb * d), _cols_map(G),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hbk * d), _cols_map_j(G),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hbk * d), _cols_map_j(G),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, hb * d), _cols_map(G),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, hb), _lse_map(G),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, hqd), qc.dtype),
            jax.ShapeDtypeStruct((b, G, t, hb), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, hb * d), jnp.float32),   # o accum
            pltpu.VMEM((bq, hb), jnp.float32),       # running max
            pltpu.VMEM((bq, hb), jnp.float32),       # running sum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * t * t * d,
            bytes_accessed=4 * b * t * hqd * 2,
            transcendentals=b * hq * t * t // 2,
        ),
    )(qc, kc, vc)
    return out, lse


def _fwd_cols_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                     o_acc, m_acc, l_acc, *, scale, BQ, BK, HB, D, GQ,
                     window=0):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[:] = jnp.zeros_like(l_acc)

    live = j * BK <= i * BQ + (BQ - 1)
    if window > 0:
        live = jnp.logical_and(live, (j + 1) * BK > i * BQ - window)

    @pl.when(live)
    def _():
        qpos = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        kpos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        m_new_c, l_new_c, o_new_c = [], [], []
        for hh in range(HB):
            ql = (qb[:, hh * D:(hh + 1) * D].astype(jnp.float32) * scale
                  ).astype(jnp.bfloat16)
            kvc = (hh // GQ) * D
            s = jnp.dot(ql, kb[:, kvc:kvc + D].T,
                        preferred_element_type=jnp.float32)
            s = jnp.where(allowed, s, _NEG_INF)
            m_prev = m_acc[:, hh:hh + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new_c.append(l_acc[:, hh:hh + 1] * alpha +
                           jnp.sum(p, axis=-1, keepdims=True))
            o_new_c.append(o_acc[:, hh * D:(hh + 1) * D] * alpha + jnp.dot(
                p.astype(jnp.bfloat16), vb[:, kvc:kvc + D],
                preferred_element_type=jnp.float32))
            m_new_c.append(m_new)
        m_acc[:] = jnp.concatenate(m_new_c, axis=-1)
        l_acc[:] = jnp.concatenate(l_new_c, axis=-1)
        o_acc[:] = jnp.concatenate(o_new_c, axis=-1)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        l = jnp.maximum(l_acc[:], 1e-30)                      # (BQ, HB)
        o = jnp.concatenate(
            [o_acc[:, hh * D:(hh + 1) * D] / l[:, hh:hh + 1]
             for hh in range(HB)], axis=-1)
        o_ref[0] = o.astype(o_ref.dtype)
        lse_ref[0, 0] = m_acc[:] + jnp.log(l)


def _fwd_cols_single(qc, kc, vc, *, hb, hbk, g, d, G, scale, window, t):
    """Single-tile forward: grid (b·G,), whole sequence per program,
    strip-tiled with static causal K extents (see the bwd kernel's
    docstring for the rationale). Each strip's softmax is FINAL — all
    its allowed keys are in extent — so the online-softmax rescale
    disappears entirely."""
    b = qc.shape[0]
    qspec = pl.BlockSpec((1, t, hb * d), lambda bg: (bg // G, 0, bg % G),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, t, hbk * d), lambda bg: (bg // G, 0, bg % G),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, t, hb), lambda bg: (bg // G, bg % G, 0, 0),
                         memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_cols_single_kernel, scale=scale, T=t,
                          HB=hb, D=d, GQ=g, window=window),
        grid=(b * G,),
        in_specs=[qspec, kspec, kspec],
        out_specs=(qspec, lspec),
        out_shape=(
            jax.ShapeDtypeStruct(qc.shape, qc.dtype),
            jax.ShapeDtypeStruct((b, G, t, hb), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * G * hb * t * t * d,
            bytes_accessed=4 * b * t * hb * G * d * 2,
            transcendentals=b * G * hb * t * t // 2,
        ),
    )(qc, kc, vc)
    return out, lse


def _fwd_cols_single_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                            *, scale, T, HB, D, GQ, window=0):
    qb, kb, vb = q_ref[0], k_ref[0], v_ref[0]
    QS = min(QS_ROWS, T)
    o_c, lse_c = [], []
    for hh in range(HB):
        kvc = (hh // GQ) * D
        ql = (qb[:, hh * D:(hh + 1) * D].astype(jnp.float32) * scale
              ).astype(jnp.bfloat16)
        kl = kb[:, kvc:kvc + D]
        vl = vb[:, kvc:kvc + D]
        o_s, lse_s = [], []
        for q0 in range(0, T, QS):
            ext = q0 + QS                   # static causal K extent
            qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 0)
            kpos = jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 1)
            allowed = kpos <= qpos
            if window > 0:
                allowed = jnp.logical_and(allowed, kpos > qpos - window)
            s = jnp.dot(ql[q0:ext], kl[:ext].T,
                        preferred_element_type=jnp.float32)   # [QS, ext]
            s = jnp.where(allowed, s, _NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            o_s.append(jnp.dot(p.astype(jnp.bfloat16), vl[:ext],
                               preferred_element_type=jnp.float32) / l)
            lse_s.append(m + jnp.log(l))
        o_c.append(jnp.concatenate(o_s, axis=0))
        lse_c.append(jnp.concatenate(lse_s, axis=0))
    o_ref[0] = jnp.concatenate(o_c, axis=-1).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.concatenate(lse_c, axis=-1)


@functools.partial(jax.jit, static_argnames=("hq", "scale", "window"))
def _flash_cols_bwd_call(qc, kc, vc, out, lse, gc, *, hq: int, scale: float,
                         window: int = 0):
    b, t, hqd = qc.shape
    d = hqd // hq
    hkv = kc.shape[2] // d
    hb, hbk, g = _col_cfg(hq, hkv, d)
    G = hq // hb
    bq, bk = _tiles(t)
    if t == bq == bk and t % min(QS_ROWS, t) == 0:
        return _bwd_cols_fused(qc, kc, vc, gc, out, lse, G=G, hb=hb,
                               hbk=hbk, g=g, d=d, scale=scale,
                               window=window, t=t)
    return _bwd_cols_twopass(qc, kc, vc, gc, out, lse, G=G, hb=hb,
                             hbk=hbk, g=g, d=d, scale=scale,
                             window=window, bq=bq, bk=bk)


def _bwd_cols_fused(qc, kc, vc, gc, out, lse, *, G, hb, hbk, g, d, scale,
                    window, t):
    """Single-tile fused backward: grid (b*G,), whole group in one
    program - dq,dk,dv in one pass, zero scratch (kv ownership makes
    the group accumulation a plain in-program loop)."""
    b = qc.shape[0]
    qspec = pl.BlockSpec((1, t, hb * d), lambda bg: (bg // G, 0, bg % G),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, t, hbk * d), lambda bg: (bg // G, 0, bg % G),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, t, hb), lambda bg: (bg // G, bg % G, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_cols_fused_kernel, scale=scale, T=t,
                          HB=hb, HBK=hbk, D=d, GQ=g, window=window),
        grid=(b * G,),
        in_specs=[qspec, kspec, kspec, qspec, qspec, lspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(qc.shape, jnp.bfloat16),
            jax.ShapeDtypeStruct(kc.shape, jnp.bfloat16),
            jax.ShapeDtypeStruct(vc.shape, jnp.bfloat16),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * G * hb * t * t * d,
            bytes_accessed=8 * b * t * hb * G * d * 2,
            transcendentals=b * G * hb * t * t,
        ),
    )(qc, kc, vc, gc, out, lse)
    return dq, dk, dv


def _bwd_cols_fused_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                           dq_ref, dk_ref, dv_ref, *, scale, T, HB, HBK,
                           D, GQ, window=0):
    """Single-program whole-sequence backward, STRIP-TILED: q is
    processed in QS-row strips with STATIC K extents — strip [q0, q0+QS)
    only attends keys < q0+QS under the causal mask, so the s/dp dots
    and every VPU tensor shrink to [QS, q0+QS] (≈37% less work at
    T=1024/QS=256 vs the full [T, T] tile), and the ≤1 MB intermediates
    leave Mosaic room to overlap strip i's VPU chain with strip i+1's
    MXU dots — the full-tile version measured fully serialized
    (28 us/program ≈ VPU 14.5 + MXU 19 at GPT2-774M shapes)."""
    qb, kb, vb, gb, ob = q_ref[0], k_ref[0], v_ref[0], g_ref[0], o_ref[0]
    lse_b = lse_ref[0, 0]                                      # (T, HB)
    QS = min(QS_ROWS, T)
    dq_c = []
    dk_c = [None] * HBK
    dv_c = [None] * HBK
    for hh in range(HB):
        kv = hh // GQ
        kvc = kv * D
        ql = qb[:, hh * D:(hh + 1) * D]
        kl = kb[:, kvc:kvc + D]
        vl = vb[:, kvc:kvc + D]
        gl = gb[:, hh * D:(hh + 1) * D]
        ol = ob[:, hh * D:(hh + 1) * D]
        qs = (ql.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        n_strips = T // QS
        dq_s = []
        # strip-aligned segment accumulators (static slices only — a
        # dynamic .at[:ext].add scatter captures constants under Pallas)
        segs_k = [None] * n_strips
        segs_v = [None] * n_strips
        for q0 in range(0, T, QS):
            ext = q0 + QS                       # static causal K extent
            qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 0)
            kpos = jax.lax.broadcasted_iota(jnp.int32, (QS, ext), 1)
            allowed = kpos <= qpos
            if window > 0:
                allowed = jnp.logical_and(allowed, kpos > qpos - window)
            s = jnp.dot(qs[q0:ext], kl[:ext].T,
                        preferred_element_type=jnp.float32)    # [QS, ext]
            s = jnp.where(allowed, s, _NEG_INF)
            p = jnp.exp(s - lse_b[q0:ext, hh:hh + 1])
            pb = p.astype(jnp.bfloat16)
            gs = gl[q0:ext]
            dv_part = jax.lax.dot_general(
                pb, gs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [ext, D]
            dp = jnp.dot(gs, vl[:ext].T, preferred_element_type=jnp.float32)
            delta = jnp.sum(gs.astype(jnp.float32) *
                            ol[q0:ext].astype(jnp.float32),
                            axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dsb = ds.astype(jnp.bfloat16)
            dk_part = jax.lax.dot_general(
                dsb, ql[q0:ext], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [ext, D]
            for si in range(ext // QS):
                piece_k = dk_part[si * QS:(si + 1) * QS]
                piece_v = dv_part[si * QS:(si + 1) * QS]
                segs_k[si] = piece_k if segs_k[si] is None \
                    else segs_k[si] + piece_k
                segs_v[si] = piece_v if segs_v[si] is None \
                    else segs_v[si] + piece_v
            dq_s.append(jnp.dot(dsb, kl[:ext],
                                preferred_element_type=jnp.float32))
        dq_c.append(jnp.concatenate(dq_s, axis=0))
        dk_h = jnp.concatenate(segs_k, axis=0)
        dv_h = jnp.concatenate(segs_v, axis=0)
        dk_c[kv] = dk_h if dk_c[kv] is None else dk_c[kv] + dk_h
        dv_c[kv] = dv_h if dv_c[kv] is None else dv_c[kv] + dv_h
    dq_ref[0] = jnp.concatenate(dq_c, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dk_c, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dv_c, axis=-1).astype(dv_ref.dtype)


def _bwd_cols_twopass(qc, kc, vc, gc, out, lse, *, G, hb, hbk, g, d, scale,
                      window, bq, bk):
    """General path (t > max tile): dK/dV sweep + dQ sweep, column
    blocks, q-group accumulation in-program."""
    b, t, _ = qc.shape
    qspec_i = pl.BlockSpec((1, bq, hb * d), _cols_map(G),
                           memory_space=pltpu.VMEM)
    kspec_j = pl.BlockSpec((1, bk, hbk * d), _cols_map_j(G),
                           memory_space=pltpu.VMEM)
    lspec_i = pl.BlockSpec((1, 1, bq, hb), _lse_map(G),
                           memory_space=pltpu.VMEM)
    # dK/dV sweep: grid (b*G, kv tile j, q tile i-sequential)
    qspec_seq = pl.BlockSpec((1, bq, hb * d),
                             lambda bg, j, i: (bg // G, i, bg % G),
                             memory_space=pltpu.VMEM)
    lspec_seq = pl.BlockSpec((1, 1, bq, hb),
                             lambda bg, j, i: (bg // G, bg % G, i, 0),
                             memory_space=pltpu.VMEM)
    kspec_par = pl.BlockSpec((1, bk, hbk * d),
                             lambda bg, j, i: (bg // G, j, bg % G),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_cols_dkv_kernel, scale=scale, BQ=bq, BK=bk,
                          HB=hb, HBK=hbk, D=d, GQ=g, window=window),
        grid=(b * G, t // bk, t // bq),
        in_specs=[qspec_seq, kspec_par, kspec_par, qspec_seq, qspec_seq,
                  lspec_seq],
        out_specs=(kspec_par, kspec_par),
        out_shape=(
            jax.ShapeDtypeStruct(kc.shape, jnp.bfloat16),
            jax.ShapeDtypeStruct(vc.shape, jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, hbk * d), jnp.float32),
            pltpu.VMEM((bk, hbk * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(qc, kc, vc, gc, out, lse)

    # dQ sweep: grid (b*G, q tile i, kv tile j-sequential)
    dq = pl.pallas_call(
        functools.partial(_bwd_cols_dq_kernel, scale=scale, BQ=bq, BK=bk,
                          HB=hb, HBK=hbk, D=d, GQ=g, window=window),
        grid=(b * G, t // bq, t // bk),
        in_specs=[qspec_i, kspec_j, kspec_j, qspec_i, qspec_i, lspec_i],
        out_specs=qspec_i,
        out_shape=jax.ShapeDtypeStruct(qc.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bq, hb * d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(qc, kc, vc, gc, out, lse)
    return dq, dk, dv


def _bwd_cols_dkv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                         dk_ref, dv_ref, dk_acc, dv_acc, *, scale, BQ, BK,
                         HB, HBK, D, GQ, window=0):
    j = pl.program_id(1)            # kv tile (parallel)
    i = pl.program_id(2)            # q tile (sequential)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    live = i * BQ + (BQ - 1) >= j * BK
    if window > 0:
        live = jnp.logical_and(live, (j + 1) * BK > i * BQ - window)

    @pl.when(live)
    def _():
        qpos = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        kpos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        qb, kb, vb, gb, ob = (q_ref[0], k_ref[0], v_ref[0], g_ref[0],
                              o_ref[0])
        lse_b = lse_ref[0, 0]
        dk_c = [None] * HBK
        dv_c = [None] * HBK
        for hh in range(HB):
            kv = hh // GQ
            kvc = kv * D
            ql = qb[:, hh * D:(hh + 1) * D]
            gl = gb[:, hh * D:(hh + 1) * D]
            ol = ob[:, hh * D:(hh + 1) * D]
            qs = (ql.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            s = jnp.dot(qs, k_ref[0][:, kvc:kvc + D].T,
                        preferred_element_type=jnp.float32)
            s = jnp.where(allowed, s, _NEG_INF)
            p = jnp.exp(s - lse_b[:, hh:hh + 1])
            dv_h = jax.lax.dot_general(
                p.astype(jnp.bfloat16), gl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jnp.dot(gl, vb[:, kvc:kvc + D].T,
                         preferred_element_type=jnp.float32)
            delta = jnp.sum(gl.astype(jnp.float32) *
                            ol.astype(jnp.float32), axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dk_h = jax.lax.dot_general(
                ds.astype(jnp.bfloat16), ql, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_c[kv] = dk_h if dk_c[kv] is None else dk_c[kv] + dk_h
            dv_c[kv] = dv_h if dv_c[kv] is None else dv_c[kv] + dv_h
        dk_acc[:] += jnp.concatenate(dk_c, axis=-1)
        dv_acc[:] += jnp.concatenate(dv_c, axis=-1)

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_cols_dq_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                        dq_ref, dq_acc, *, scale, BQ, BK, HB, HBK, D, GQ,
                        window=0):
    i = pl.program_id(1)   # q tile (parallel)
    j = pl.program_id(2)   # kv tile (sequential)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    live = j * BK <= i * BQ + (BQ - 1)
    if window > 0:
        live = jnp.logical_and(live, (j + 1) * BK > i * BQ - window)

    @pl.when(live)
    def _():
        qpos = i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        kpos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        allowed = kpos <= qpos
        if window > 0:
            allowed = jnp.logical_and(allowed, kpos > qpos - window)
        qb, kb, vb, gb, ob = (q_ref[0], k_ref[0], v_ref[0], g_ref[0],
                              o_ref[0])
        lse_b = lse_ref[0, 0]
        dq_c = []
        for hh in range(HB):
            kvc = (hh // GQ) * D
            ql = qb[:, hh * D:(hh + 1) * D]
            gl = gb[:, hh * D:(hh + 1) * D]
            ol = ob[:, hh * D:(hh + 1) * D]
            qs = (ql.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            s = jnp.dot(qs, kb[:, kvc:kvc + D].T,
                        preferred_element_type=jnp.float32)
            s = jnp.where(allowed, s, _NEG_INF)
            p = jnp.exp(s - lse_b[:, hh:hh + 1])
            dp = jnp.dot(gl, vb[:, kvc:kvc + D].T,
                         preferred_element_type=jnp.float32)
            delta = jnp.sum(gl.astype(jnp.float32) *
                            ol.astype(jnp.float32), axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dq_c.append(jnp.dot(ds.astype(jnp.bfloat16),
                                kb[:, kvc:kvc + D],
                                preferred_element_type=jnp.float32))
        dq_acc[:] += jnp.concatenate(dq_c, axis=-1)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)
