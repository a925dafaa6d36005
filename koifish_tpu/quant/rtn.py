"""Round-to-nearest (RTN) & NormalFloat groupwise weight quantization.

TPU-native rebuild of the reference quantizer family ``GeQuant``
(reference: src/Tensor/GeQuant.cpp — ``RTN_x`` :428, NF ``RT_NormalF`` :732,
ternary ``YinYang`` :536, sweep driver ``LowBit_worker`` :830-905).

All functions are pure jnp and jittable; quantize-at-load runs them once
per weight on device (the analog of ``Serial_Quant_MMAP``,
reference: src/Device/CUDA/huTensor.cu:487).
"""
from __future__ import annotations

import functools as _functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from koifish_tpu.dtypes import DEFAULT_GROUP, QFormat
from koifish_tpu.quant.packing import pack_codes
from koifish_tpu.quant.qtensor import QTensor, codebook_for


def _round_away(x: jnp.ndarray) -> jnp.ndarray:
    """round-half-away-from-zero — matches CUDA ``roundf`` semantics used by
    the reference's quant math (SURVEY.md §7 hard-part #3)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _grouped(w: jnp.ndarray, group: int) -> jnp.ndarray:
    n_in = w.shape[0]
    if n_in % group:
        raise ValueError(f"in-features {n_in} not divisible by group {group}")
    return w.reshape(n_in // group, group, -1)


def quantize(
    w: jnp.ndarray,
    fmt: QFormat,
    group: int = DEFAULT_GROUP,
    symmetric: bool = True,
    scale_dtype=jnp.float32,
) -> QTensor:
    """Quantize weight ``w`` ([in, out]) to ``fmt`` with per-group scales."""
    orig_shape = tuple(w.shape)
    w2 = w.reshape(w.shape[0], -1).astype(jnp.float32)
    g = _grouped(w2, group)                      # [G, group, out]

    if fmt in (QFormat.F8_E5M2, QFormat.F8_E4M3):
        # F8Ex analog (reference QUANT_MODE::F8Ex, CLI_params.hpp:484;
        # CU_Float2F8 operator.cuh:519-535). The reference casts raw
        # bf16 -> e5m2; we add per-group absmax scaling into the fp8
        # dynamic range first — strictly tighter than the raw cast and
        # the same shape XLA consumes for fp8 dots (scale epilogue).
        fmax = float(jnp.finfo(fmt.jnp_dtype).max)
        absmax = jnp.max(jnp.abs(g), axis=1)
        scale = jnp.maximum(absmax / fmax, 1e-12)
        codes = (g / scale[:, None, :]).astype(fmt.jnp_dtype)
        return QTensor(codes=codes.reshape(w2.shape),
                       scales=scale.astype(scale_dtype), zeros=None,
                       fmt=fmt, shape=orig_shape, group=group)
    if fmt in (QFormat.NF4, QFormat.NF3):
        absmax = jnp.max(jnp.abs(g), axis=1)     # [G, out]
        scale = jnp.maximum(absmax, 1e-12)
        book = codebook_for(fmt)
        mids = (book[1:] + book[:-1]) / 2.0
        normed = g / scale[:, None, :]
        raw = jnp.searchsorted(mids, normed.reshape(-1)).reshape(g.shape)
        codes, zeros = raw.astype(jnp.uint8), None
    elif fmt is QFormat.BINARY:
        scale = jnp.maximum(jnp.mean(jnp.abs(g), axis=1), 1e-12)
        raw = (g >= 0).astype(jnp.uint8)
        codes, zeros = raw, None
    elif fmt is QFormat.TERNARY:
        # BitNet-style: scale = mean|w|, codes in {-1,0,1} stored biased +1
        # (reference ternary "YinYang": src/Tensor/GeQuant.cpp:536)
        scale = jnp.maximum(jnp.mean(jnp.abs(g), axis=1), 1e-12)
        q = jnp.clip(_round_away(g / scale[:, None, :]), -1, 1)
        codes, zeros = (q + 1).astype(jnp.uint8), None
    elif symmetric:
        bits = fmt.bits
        qmax = float((1 << (bits - 1)) - 1)
        absmax = jnp.max(jnp.abs(g), axis=1)
        # INT2 has levels {-2,-1,0,1}: absmax/1 scaling would collapse most
        # Gaussian weights to 0 — use absmax/2 so ±1 stay populated.
        divisor = 2.0 if fmt is QFormat.INT2 else qmax
        scale = jnp.maximum(absmax / divisor, 1e-12)
        q = jnp.clip(_round_away(g / scale[:, None, :]), -qmax - 1, qmax)
        if fmt is QFormat.INT8:
            codes, zeros = q.astype(jnp.int8), None
        else:
            bias = 1 << (bits - 1)
            codes, zeros = (q + bias).astype(jnp.uint8), None
    else:
        # asymmetric: scale=(max-min)/(2^b-1), zero offset stored per group
        bits = fmt.bits
        levels = float((1 << bits) - 1)
        lo = jnp.min(g, axis=1)
        hi = jnp.max(g, axis=1)
        scale = jnp.maximum((hi - lo) / levels, 1e-12)
        q = jnp.clip(_round_away((g - lo[:, None, :]) / scale[:, None, :]), 0, levels)
        if fmt is QFormat.INT8:
            # store unsigned codes biased to int8
            codes = (q - 128).astype(jnp.int8)
            lo = lo + 128.0 * scale
        else:
            codes = q.astype(jnp.uint8)
        zeros = lo.astype(scale_dtype)

    flat = codes.reshape(w2.shape[0], w2.shape[1])
    packed = pack_codes(flat, fmt, group=group)
    qt = QTensor(
        codes=packed,
        scales=scale.astype(scale_dtype),
        zeros=zeros,
        fmt=fmt,
        shape=orig_shape if len(orig_shape) == 2 else (w2.shape[0], w2.shape[1]),
        group=group,
    )
    return qt


@_functools.lru_cache(maxsize=None)
def _jit_quantize(fmt: QFormat, group: int, symmetric: bool):
    return jax.jit(_functools.partial(quantize, fmt=fmt, group=group,
                                      symmetric=symmetric))


def quantize_jit(w: jnp.ndarray, fmt: QFormat, group: int = DEFAULT_GROUP,
                 symmetric: bool = True) -> QTensor:
    """Shape-cached jitted ``quantize`` — the quantize-at-load entry.
    Eager dispatch leaves every group reduction as a separate CPU op with
    f32 temporaries; jitting fuses them (measured at Qwen3-32B embed dims
    [5120, 151936]: 64 s eager → 7 s cold / 1.5 s warm). Repeated layer
    shapes hit jax's executable cache, so a 64-layer load compiles each
    distinct shape once."""
    return _jit_quantize(fmt, group, symmetric)(w)


def quant_error(w: jnp.ndarray, qt: QTensor) -> jnp.ndarray:
    """Relative L2 dequantization error — the reference's quality probe
    (``T_errQ`` target, src/CLI_params.hpp:519; GeQuant.cpp:885)."""
    wd = qt.dequantize(jnp.float32).reshape(w.shape)
    err = jnp.linalg.norm(w.astype(jnp.float32) - wd)
    return err / jnp.maximum(jnp.linalg.norm(w.astype(jnp.float32)), 1e-12)


def quantize_best(
    w: jnp.ndarray,
    fmts: Sequence[QFormat],
    group: int = DEFAULT_GROUP,
) -> tuple[QTensor, float]:
    """Sweep formats, keep the lowest-error one — analog of the reference's
    ``LowBit_worker`` per-method sweep (GeQuant.cpp:830-905)."""
    best: Optional[QTensor] = None
    best_err = float("inf")
    for fmt in fmts:
        qt = quantize(w, fmt, group=group)
        err = float(quant_error(w, qt))
        if err < best_err:
            best, best_err = qt, err
    assert best is not None
    return best, best_err


def fake_quant(w: jnp.ndarray, fmt: QFormat, group: int = DEFAULT_GROUP) -> jnp.ndarray:
    """quantize→dequantize in the weight's dtype (QAT forward path; the
    analog of ``CU_FQUANT_128_``, reference: quantizer.cu:195-247)."""
    return quantize(w, fmt, group=group).dequantize(w.dtype).reshape(w.shape)
