"""Pallas fused cross-entropy classifier — dot→softmax-stats→gold on-chip.

The TPU analog of the reference's fused_classifier kernel
(src/Device/CUDA/kernel/fused_classifier.cuh:68), replacing the XLA
vocab-chunk scan in ops/cross_entropy.fused_ce_loss on the hot path.

Why a kernel: the scan's per-chunk [M, chunk] logits / exp intermediates
don't fit VMEM, so XLA streams them through HBM between fusions — at
GPT2-774M (M=16384, V=50304) that is ~17 GB/step of pure intermediate
traffic, measured ~40 ms against a ~12 ms bf16 dot roofline
(prof_step.py, v5e). Here each grid step computes one [BM, BV] logits
tile in VMEM, folds it into running (max, sumexp, gold) columns, and
discards it — the only HBM traffic is x, w and three [M, 1] columns.

Backward is the flash-attention-style recompute recipe, two kernels:
- dx sweep (grid M-major, V sequential): recompute the logits tile,
  p = exp(logits − lse), dlogits = (p − onehot)·w_tok, accumulate
  dx += dlogits @ wᵀ in VMEM scratch.
- dw sweep (grid V-major, M sequential): same recompute, accumulate
  dw += xᵀ @ dlogits; the w tile is grid-invariant per column block.

The onehot never exists: gold gathers as a masked row-sum in the
forward, and dlogits subtracts a compare-select — both pure VPU tile
ops. Vocab tails (V not a multiple of BV) are masked in-kernel, so
odd vocab sizes (50304 = 393·128, 151936) need no padding.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

BM = 512    # token rows per program
BV = 1024   # vocab columns per program

_INTERPRET = False


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


def _bm_for(m: int) -> Optional[int]:
    return next((c for c in (BM, 256, 128) if m % c == 0), None)


def _bv_for(e: int) -> int:
    """Vocab-tile width: shrink for wide E so the dw sweep's [E, BV] f32
    accumulator + the [E, BV] weight tile stay inside VMEM (at E=5120,
    BV=1024 would need a 20 MB accumulator + 10 MB weight tile; BV=512
    halves both — the Qwen3-32B head is E=5120, V=151936)."""
    return BV if e <= 4096 else 512


def eligible(m: int, e: int, v: int) -> bool:
    """Kernel path available for [m, e] hidden against an [e, v] head.
    E only needs sublane alignment — Mosaic lane-pads non-128-multiple
    E (GPT2-1558M's 1600 verified exact on chip; E>4096 runs narrower
    vocab tiles, _bv_for)."""
    return (_platform_is_tpu() and _bm_for(m) is not None
            and e % 8 == 0 and e <= 8192 and v >= 2 * BV)


# ---------------------------------------------------------------------------
# forward: (lse, gold) columns
# ---------------------------------------------------------------------------
# Each kernel exists in a bf16 flavor (x, w operands) and an int8 flavor
# (xq, wq codes + sx row / sw column scales — the FP8-training analog:
# the logits dots run the MXU at the 2x int8 rate, the dx/dw grad dots
# stay bf16 for quality, matching ops/int8_train's measured recipe).

def _tile_logits(x_ref, w_ref, scales):
    if scales is None:
        return jnp.dot(x_ref[...], w_ref[...],
                       preferred_element_type=jnp.float32)
    sx_ref, sw_ref = scales
    acc = jnp.dot(x_ref[...], w_ref[...],
                  preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...]


def _io_specs(bm, e, v, int8, bv=BV):
    """(in_specs, arg slots) shared by all three kernels: x, w
    [, sx, sw], tgt."""
    col_i = pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((bm, e), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((e, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if int8:
        specs += [col_i,
                  pl.BlockSpec((1, bv), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)]
    specs += [col_i]
    return specs, col_i


@functools.partial(jax.jit, static_argnames=("int8",))
def _fwd_call(x, w, tgt_col, sx=None, sw=None, *, int8=False):
    m, e = x.shape
    v = w.shape[1]
    bm = _bm_for(m)
    bv = _bv_for(e)
    nj = -(-v // bv)
    grid = (m // bm, nj)
    specs, col_i = _io_specs(bm, e, v, int8, bv)
    args = (x, w) + ((sx, sw) if int8 else ()) + (tgt_col,)
    lse, gold = pl.pallas_call(
        functools.partial(_fwd_kernel, V=v, BV=bv, NJ=nj, INT8=int8),
        grid=grid,
        in_specs=specs,
        out_specs=(col_i, col_i),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),    # running max
            pltpu.VMEM((bm, 1), jnp.float32),    # running sumexp
            pltpu.VMEM((bm, 1), jnp.float32),    # gold logit
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * e * v,
            bytes_accessed=(m * e + e * v) * 2,
            transcendentals=m * v,
        ),
    )(*args)
    return lse, gold


def _fwd_kernel(*refs, V, BV, NJ, INT8):
    if INT8:
        (x_ref, w_ref, sx_ref, sw_ref, tgt_ref, lse_ref, gold_ref,
         m_acc, s_acc, g_acc) = refs
        scales = (sx_ref, sw_ref)
    else:
        (x_ref, w_ref, tgt_ref, lse_ref, gold_ref,
         m_acc, s_acc, g_acc) = refs
        scales = None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        s_acc[:] = jnp.zeros_like(s_acc)
        g_acc[:] = jnp.zeros_like(g_acc)

    logits = _tile_logits(x_ref, w_ref, scales)               # [BM, BV]
    bm = logits.shape[0]
    vpos = j * BV + jax.lax.broadcasted_iota(jnp.int32, (bm, BV), 1)
    if V % BV:
        logits = jnp.where(vpos < V, logits, _NEG_INF)
    tgt = tgt_ref[...]                                        # [BM, 1]
    sel = vpos == tgt
    g_acc[...] += jnp.sum(jnp.where(sel, logits, 0.0), axis=-1,
                          keepdims=True)
    m_prev = m_acc[...]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    s_acc[...] = s_acc[...] * jnp.exp(m_prev - m_new) + \
        jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True)
    m_acc[...] = m_new

    @pl.when(j == NJ - 1)
    def _():
        lse_ref[...] = m_acc[...] + jnp.log(jnp.maximum(s_acc[...], 1e-30))
        gold_ref[...] = g_acc[...]


# ---------------------------------------------------------------------------
# backward: dx sweep + dw sweep (logits recomputed per tile)
# ---------------------------------------------------------------------------

def _recompute_dlogits(x_ref, w_ref, tgt_ref, lse_ref, wtok_ref, scales,
                       j, *, V, BV):
    logits = _tile_logits(x_ref, w_ref, scales)               # [BM, BV]
    bm = logits.shape[0]
    p = jnp.exp(logits - lse_ref[...])
    vpos = j * BV + jax.lax.broadcasted_iota(jnp.int32, (bm, BV), 1)
    if V % BV:
        p = jnp.where(vpos < V, p, 0.0)
    sel = vpos == tgt_ref[...]
    return (jnp.where(sel, p - 1.0, p) * wtok_ref[...]).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("int8",))
def _dx_call(x, w, tgt_col, lse, wtok, sx=None, sw=None, *, int8=False):
    m, e = x.shape
    v = w.shape[1]
    bm = _bm_for(m)
    bv = _bv_for(e)
    nj = -(-v // bv)
    specs, col = _io_specs(bm, e, v, int8, bv)
    args = (x, w) + ((sx, sw) if int8 else ()) + (tgt_col, lse, wtok)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, V=v, BV=bv, NJ=nj, INT8=int8),
        grid=(m // bm, nj),
        in_specs=specs + [col, col],
        out_specs=pl.BlockSpec((bm, e), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, e), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * e * v,
            bytes_accessed=(2 * m * e + e * v) * 2,
            transcendentals=m * v,
        ),
    )(*args)
    return dx


def _dx_kernel(*refs, V, BV, NJ, INT8):
    if INT8:
        (x_ref, w_ref, sx_ref, sw_ref, tgt_ref, lse_ref, wtok_ref,
         dx_ref, dx_acc) = refs
        scales = (sx_ref, sw_ref)
    else:
        (x_ref, w_ref, tgt_ref, lse_ref, wtok_ref, dx_ref, dx_acc) = refs
        scales = None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dx_acc[:] = jnp.zeros_like(dx_acc)

    dlog = _recompute_dlogits(x_ref, w_ref, tgt_ref, lse_ref, wtok_ref,
                              scales, j, V=V, BV=BV)
    if INT8:
        # dgrad against the DEQUANTIZED forward codes (same rounding as
        # the fwd dot — ops/int8_train's bwd recipe)
        wt = (w_ref[...].astype(jnp.int32).astype(jnp.float32)
              * sw_ref[...]).astype(jnp.bfloat16)
    else:
        wt = w_ref[...]
    if V % BV:
        # the tail block's out-of-bounds lanes hold unspecified fill;
        # dlog is zero there, but the dx dot contracts them (0*NaN)
        cpos = j * BV + jax.lax.broadcasted_iota(jnp.int32, wt.shape, 1)
        wt = jnp.where(cpos < V, wt, jnp.zeros_like(wt))
    # dx += dlogits @ wᵀ  (contract the BV lane dim of both operands)
    dx_acc[...] += jax.lax.dot_general(
        dlog, wt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == NJ - 1)
    def _():
        dx_ref[...] = dx_acc[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("int8",))
def _dw_call(x, w, tgt_col, lse, wtok, xq=None, sx=None, sw=None, *,
             int8=False):
    m, e = x.shape
    v = w.shape[1]
    bm = _bm_for(m)
    bv = _bv_for(e)
    ni = m // bm
    col = pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                       memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((bm, e), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((e, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
    specs = [xspec, wspec]
    args = (x, w)
    if int8:
        # xq feeds the int8 logits recompute; the TRUE bf16 x feeds the
        # wgrad dot (int8 wgrad measured harmful — int8_train docstring)
        specs += [xspec, col,
                  pl.BlockSpec((1, bv), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM)]
        args += (xq, sx, sw)
    specs += [col, col, col]
    args += (tgt_col, lse, wtok)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, V=v, BV=bv, NI=ni, INT8=int8),
        grid=(-(-v // bv), ni),
        in_specs=specs,
        out_specs=pl.BlockSpec((e, bv), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, w.shape[1]), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((e, bv), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * e * v,
            bytes_accessed=(m * e + 2 * e * v) * 2,
            transcendentals=m * v,
        ),
    )(*args)
    return dw


def _dw_kernel(*refs, V, BV, NI, INT8):
    if INT8:
        (x_ref, w_ref, xq_ref, sx_ref, sw_ref, tgt_ref, lse_ref, wtok_ref,
         dw_ref, dw_acc) = refs
        dlog = _recompute_dlogits(xq_ref, w_ref, tgt_ref, lse_ref, wtok_ref,
                                  (sx_ref, sw_ref), pl.program_id(0),
                                  V=V, BV=BV)
    else:
        (x_ref, w_ref, tgt_ref, lse_ref, wtok_ref, dw_ref, dw_acc) = refs
        dlog = _recompute_dlogits(x_ref, w_ref, tgt_ref, lse_ref, wtok_ref,
                                  None, pl.program_id(0), V=V, BV=BV)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)

    # dw += xᵀ @ dlogits (contract the BM sublane dim of both operands)
    dw_acc[...] += jax.lax.dot_general(
        x_ref[...], dlog, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == NI - 1)
    def _():
        dw_ref[...] = dw_acc[...].astype(dw_ref.dtype)


# ---------------------------------------------------------------------------
# differentiable wrapper (same contract as ops.cross_entropy.fused_ce_loss)
# ---------------------------------------------------------------------------

def _assemble(lse, gold, mask_col):
    per_tok = (lse - gold)[:, 0]
    mk = mask_col[:, 0]
    denom = jnp.maximum(mk.sum(), 1.0)
    return (per_tok * mk).sum() / denom, per_tok


def _q8_row(x):
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ce(x, w, tgt_col, mask_col, int8):
    (loss, per_tok), _ = _ce_fwd(x, w, tgt_col, mask_col, int8)
    return loss, per_tok


def _ce_fwd(x, w, tgt_col, mask_col, int8):
    if int8:
        xq, sx = _q8_row(x)
        # per-OUTPUT-column scales, computed in place (quantizing w.T
        # row-wise round-trips two full transposes of the head)
        sw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                     keepdims=True) / 127.0
        sw = jnp.maximum(sw, 1e-12)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127, 127
                      ).astype(jnp.int8)
        lse, gold = _fwd_call(xq, wq, tgt_col, sx, sw, int8=True)
        quant = (xq, sx, wq, sw)
    else:
        lse, gold = _fwd_call(x, w, tgt_col)
        quant = None
    loss, per_tok = _assemble(lse, gold, mask_col)
    return (loss, per_tok), (x, w, tgt_col, mask_col, lse, quant)


def _ce_bwd(int8, res, cts):
    g_loss, g_tok = cts
    x, w, tgt_col, mask_col, lse, quant = res
    mk = mask_col[:, 0]
    denom = jnp.maximum(mk.sum(), 1.0)
    wtok = (mk / denom * g_loss + g_tok.astype(jnp.float32))[:, None]
    if int8:
        xq, sx, wq, sw = quant
        dx = _dx_call(xq, wq, tgt_col, lse, wtok, sx, sw, int8=True)
        dw = _dw_call(x, wq, tgt_col, lse, wtok, xq, sx, sw, int8=True)
    else:
        dx = _dx_call(x, w, tgt_col, lse, wtok)
        dw = _dw_call(x, w, tgt_col, lse, wtok)
    return dx.astype(x.dtype), dw.astype(w.dtype), None, None


_ce.defvjp(_ce_fwd, _ce_bwd)


def fused_ce_pallas_or_none(
    hidden: jax.Array,            # [B, T, E]
    head_w: jax.Array,            # [E, V]
    targets: jax.Array,           # [B, T] int32
    mask: Optional[jax.Array] = None,
    int8: Optional[bool] = None,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """(mean_loss, per_token[B, T]) via the fused kernels, or None when
    the shape doesn't qualify (caller falls back to the XLA chunk scan).
    ``int8``: run the three logits dots (fwd + both bwd recomputes) as
    int8 MXU dots; None = follow the ambient Int8Policy."""
    B, T, E = hidden.shape
    V = head_w.shape[-1]
    from koifish_tpu.utils import kernel_log
    if not eligible(B * T, E, V):
        kernel_log.fallback(
            "fused_ce",
            f"m={B * T} E={E} V={V}: need m%128==0, sublane-aligned "
            f"E<=8192, V>=2048 -> XLA chunk-scan CE")
        return None
    kernel_log.choice("fused_ce", f"m={B * T} E={E} V={V}")
    if int8 is None:
        from koifish_tpu.ops.tracectx import current_int8
        pol = current_int8()
        int8 = pol is not None and pol.applies((E, V))
    m = B * T
    x = hidden.reshape(m, E).astype(jnp.bfloat16)
    w = head_w.astype(jnp.bfloat16)
    tgt_col = targets.reshape(m, 1).astype(jnp.int32)
    mask_col = (jnp.ones((m, 1), jnp.float32) if mask is None
                else mask.reshape(m, 1).astype(jnp.float32))
    loss, per_tok = _ce(x, w, tgt_col, mask_col, bool(int8))
    return loss, per_tok.reshape(B, T)
