"""Dequant-fused matmul — Pallas TPU kernel + XLA fallback.

The core of the rebuild (SURVEY.md §7 layer 3): packed sub-byte weights are
unpacked in-register inside the matmul's K-loop and multiplied by per-group
scales, never materializing the bf16 weight in HBM — the fused version of
the reference's dequant-to-scratch + cublasLt path (quantizer.cu:249 +
gemm.cu:93)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from koifish_tpu.dtypes import QFormat
from koifish_tpu.quant.qtensor import NF3_VALUES, NF4_VALUES, QTensor

NF4_LIST = list(NF4_VALUES)
NF3_LIST = list(NF3_VALUES)

# INT8 decode-GEMV flavor: "mxu" (int8 dot on the MXU) or "dot" (unpack
# to bf16 + bf16 dot). Read once at import — it selects a traced branch.
# Default flipped mxu->dot in round 5: the in-step A/B on the then-current
# runtime measured dot 3935.8 vs mxu 3897.3 agg tok/s (B=32 INT8-weight
# decode, tools/decode_int8_ab.py) and the jitted-scan micro agreed
# (545.6 vs 697.8 us) — the r3 measurement (mxu 611 < dot 692) no longer
# reproduces. ~1% in-step either way; re-A/B on runtime upgrades.
import os as _os
_INT8_GEMV = _os.environ.get("KOIFISH_INT8_GEMV", "dot")


def _ref_qmatmul(x: jax.Array, w: QTensor, out_dtype) -> jax.Array:
    wd = w.dequantize(x.dtype)
    return jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(out_dtype)


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


def qmatmul_pallas_or_ref(x: jax.Array, w: QTensor, out_dtype) -> jax.Array:
    """Dispatch: Pallas fused kernel when eligible, else XLA dequant+dot.

    Two kernels: a tiled GEMM for training/prefill (m >= 64) and a GEMV
    (m <= 32, full-K per N-tile) for decode — the GEMM would pad a decode
    batch 8 -> 256 rows (32x wasted MXU issue).
    """
    m = int(jnp.size(x) // x.shape[-1])
    k, n = w.shape[0], w.shape[-1]
    # tile constraints: bk=1024 so the scales tile is [bk/group=8, bn]
    # (sublane-aligned); bn 256 when possible, else 128
    base_ok = (
        _platform_is_tpu()
        and w.fmt in (QFormat.INT8, QFormat.INT4, QFormat.NF4,
                      QFormat.INT3, QFormat.NF3, QFormat.INT2,
                      QFormat.TERNARY, QFormat.BINARY)
        and w.zeros is None
        and k % 1024 == 0 and n % 128 == 0
        and w.group == 128
    )
    if w.codebook is not None and w.fmt not in (QFormat.NF4, QFormat.NF3):
        base_ok = False           # learned books ride NF-coded layouts only
    if not base_ok or m < 1:
        from koifish_tpu.utils import kernel_log
        kernel_log.fallback(
            "qmatmul",
            f"m={m} k={k} n={n} fmt={w.fmt.name} group={w.group} "
            f"zeros={w.zeros is not None}: need k%1024==0, n%128==0, "
            f"group==128, symmetric codes -> XLA dequant+dot")
        return _ref_qmatmul(x, w, out_dtype)
    lead = x.shape[:-1]
    x2 = x.reshape(m, k)
    if w.row_scale is not None:
        # Sinkhorn row factors fold into the ACTIVATIONS (y = (x·r) @
        # deq(codes), quant/qtensor.py:94) — after this every fused
        # kernel below is exact for SinkNormal tensors
        x2 = (x2.astype(jnp.float32)
              * w.row_scale.astype(jnp.float32)[None, :]).astype(x2.dtype)
    if w.codebook is not None:
        # learned codebooks (k-means Q_Cluster [k] / MINI per-row [K, k])
        # dequantize IN-KERNEL via a per-row select chain over the book
        # operand — the global-NF select chain would silently decode the
        # wrong values (measured 45-89% error before this dispatch)
        book = w.codebook.astype(jnp.float32)
        if book.ndim == 1:
            book = jnp.broadcast_to(book[None], (k, book.shape[0]))
        if m <= 32:
            bm = max(8, -(-m // 8) * 8)
            x2p = jnp.pad(x2, ((0, bm - m), (0, 0))) if bm != m else x2
            y = _qmv_book(x2p, w.codes, w.scales, book, fmt=w.fmt,
                          group=w.group, k=k)[:m]
        elif m >= 64:
            pad_m = (-m) % 256
            x2p = jnp.pad(x2, ((0, pad_m), (0, 0))) if pad_m else x2
            y = _qmm_book(x2p, w.codes, w.scales, book, fmt=w.fmt,
                          group=w.group, k=k)
            if pad_m:
                y = y[:m]
        else:
            return _ref_qmatmul(x, w, out_dtype)
        return y.reshape(*lead, n).astype(out_dtype)
    if m <= 32:
        # GEMV-ish decode path: pad rows to the sublane count. Covers
        # batched decode up to B=32 (the 8<m<64 XLA-dequant dead zone made
        # INT4 decode SLOWER than bf16 at B=32 — r2 measurement)
        bm = max(8, -(-m // 8) * 8)
        pad_m = bm - m
        if pad_m:
            x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        if w.fmt is QFormat.INT8 and _INT8_GEMV == "mxu":
            # int8-MXU GEMV: measured 611 vs 692 us/call against the
            # bf16-dot GEMV on chip (kernel_smoke jitted-scan timing,
            # m=32 K=1024 N=512) — the 2x MXU int8 rate beats the
            # in-kernel activation-quant cost at decode widths.
            # KOIFISH_INT8_GEMV=dot flips to the bf16-dot GEMV: a later
            # runtime re-measured the micro the other way (545 vs 698),
            # so the default is re-checked in-step each round.
            y = qmv_int8_mxu(x2, w.codes, w.scales, group=w.group, k=k)
        else:
            y = _qmv(x2, w.codes, w.scales, fmt=w.fmt, group=w.group, k=k)
        y = y[:m]
    elif m >= 64:
        pad_m = (-m) % 256
        if pad_m:
            x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        y = _qmm(x2, w.codes, w.scales, fmt=w.fmt, group=w.group, k=k)
        if pad_m:
            y = y[:m]
    else:
        from koifish_tpu.utils import kernel_log
        kernel_log.fallback(
            "qmatmul", f"m={m} in the 32<m<64 dead zone (GEMV pads to 32, "
            f"GEMM pads to 256) -> XLA dequant+dot")
        return _ref_qmatmul(x, w, out_dtype)
    return y.reshape(*lead, n).astype(out_dtype)



def _unpack_block(codes, fmt, rows, group):
    """In-kernel unpack of a packed code block -> [rows, bn] bf16 CODE
    values (scales NOT applied — the group-factored dot applies them on
    the [bm, bn] outputs instead, 64-4096x fewer elements than a [K, N]
    scale multiply). Group-local block-split order (quant/packing.py):
    the byte block [rows/cpb, bn] reshapes to [ng, sub, bn]; bit-plane j
    holds rows j*sub..(j+1)*sub of each group — unpack is cpb contiguous
    block copies, no sublane interleave. Mosaic can't shift u8 vectors,
    so codes widen to i32 first. Integer codes are exact in bf16
    (|code| <= 128 < 2^8)."""
    if fmt is QFormat.INT8:
        return codes.astype(jnp.bfloat16)
    bits = fmt.pack_bits
    cpb = fmt.codes_per_byte
    ng, sub = rows // group, group // cpb
    c32 = codes.astype(jnp.int32).reshape(ng, sub, -1)
    mask = (1 << bits) - 1
    parts = [(c32 >> (bits * j)) & mask for j in range(cpb)]
    raw = jnp.stack(parts, axis=1).reshape(rows, -1)
    if fmt in (QFormat.NF4, QFormat.NF3):
        # codebook lookup as a select chain — Mosaic kernels can't
        # capture external constants and vector gathers are slow. The
        # selects run in f32: a bf16 select on an i1 mask trips a Mosaic
        # relayout bug ("(8,128) -> (16,128) replicated dim") on chip.
        book = NF4_LIST if fmt is QFormat.NF4 else NF3_LIST
        wf = jnp.full(raw.shape, book[0], jnp.float32)
        for i in range(1, len(book)):
            wf = jnp.where(raw == i, book[i], wf)
        return wf.astype(jnp.bfloat16)
    if fmt is QFormat.TERNARY:          # {0,1,2} -> {-1,0,+1}
        return (raw - 1).astype(jnp.bfloat16)
    if fmt is QFormat.BINARY:           # {0,1} -> {-1,+1}
        return (raw * 2 - 1).astype(jnp.bfloat16)
    # signed INT4/INT3/INT2 stored biased by 2**(bits-1)
    return (raw - (1 << (fmt.bits - 1))).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("fmt", "group", "k"))
def _qmv(x, codes, scales, *, fmt: QFormat, group: int, k: int):
    """Dequant-fused GEMV: x [bm<=32, K] x packed w [K, N] -> [bm, N].
    Grid over N tiles; the full K stays in VMEM per tile (K <= 8192)."""
    n = codes.shape[-1]
    bm = x.shape[0]
    bn = 256 if n % 256 == 0 else 128
    cpb = fmt.codes_per_byte if fmt.is_sub_byte else 1
    kernel = functools.partial(_qmv_kernel, fmt=fmt, group=group, k=k)
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // cpb, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // group, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * k,
            bytes_accessed=bm * k * 2 + k * n // cpb + bm * n * 2,
            transcendentals=0,
        ),
    )(x, codes, scales)


def _qmv_kernel(x_ref, w_ref, s_ref, o_ref, *, fmt, group, k):
    # group-factored scales: y = sum_g (x_g @ codes_g) * s_g — the dot
    # runs on raw bf16 codes (exact), the scale hits [bm, bn] outputs
    wf = _unpack_block(w_ref[:], fmt, k, group)
    x = x_ref[:].astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.float32)                    # [ng, bn]
    acc = jnp.zeros((x.shape[0], wf.shape[1]), jnp.float32)
    for g in range(k // group):
        d = jnp.dot(x[:, g * group:(g + 1) * group],
                    wf[g * group:(g + 1) * group, :],
                    preferred_element_type=jnp.float32)
        acc = acc + d * s[g:g + 1, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def qmv_int8_mxu(x, codes, scales, *, group: int, k: int):
    """EXPERIMENTAL int8-MXU decode GEMV for INT8 weights: activations
    dynamic-quantized per (row, group) IN-KERNEL, int8 x int8 -> int32
    MXU dots, f32 scale fixup on the [bm, bn] outputs:

        y = sum_g (q8(x_g) @ wq_g) . sx[:, g] . s[g, :]

    vs `_qmv`'s bf16 widen + bf16 dot. Measured on chip (kernel_smoke
    jitted-scan timing, m=32 K=1024 N=512): 611 vs 692 us/call — the 2x
    MXU int8 rate beats the in-kernel activation-quant cost, so this IS
    the INT8-format decode dispatch default (qmatmul_pallas_or_ref);
    activation quantization adds ~0.6% relative error (oracle-checked,
    same order as the weight-quant noise).
    """
    n = codes.shape[-1]
    bm = x.shape[0]
    bn = 256 if n % 256 == 0 else 128
    kernel = functools.partial(_qmv_int8_kernel, group=group, k=k)
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // group, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * k,
            bytes_accessed=bm * k * 2 + k * n + bm * n * 2,
            transcendentals=0,
        ),
    )(x, codes, scales)


def _qmv_int8_kernel(x_ref, w_ref, s_ref, o_ref, *, group, k):
    xf = x_ref[:].astype(jnp.float32)                   # [bm, K]
    s = s_ref[:].astype(jnp.float32)                    # [ng, bn]
    acc = jnp.zeros((xf.shape[0], w_ref.shape[1]), jnp.float32)
    for g in range(k // group):
        xg = xf[:, g * group:(g + 1) * group]
        sx = jnp.max(jnp.abs(xg), axis=1, keepdims=True) / 127.0  # [bm, 1]
        sx = jnp.maximum(sx, 1e-12)
        xq = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)
        d = jnp.dot(xq, w_ref[g * group:(g + 1) * group, :],
                    preferred_element_type=jnp.int32)
        acc = acc + d.astype(jnp.float32) * sx * s[g:g + 1, :]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fmt", "group", "k"))
def _qmm(x, codes, scales, *, fmt: QFormat, group: int, k: int):
    m, n = x.shape[0], codes.shape[-1]
    bm, bk = 256, 1024
    bn = 256 if n % 256 == 0 else 128
    grid = (m // bm, n // bn, k // bk)
    cpb = fmt.codes_per_byte if fmt.is_sub_byte else 1

    kernel = functools.partial(_qmm_kernel, fmt=fmt, group=group, bk=bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // cpb, bn), lambda i, j, t: (t, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // group, bn), lambda i, j, t: (t, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n // cpb + m * n * 2,
            transcendentals=0,
        ),
    )(x, codes, scales)


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, fmt, group, bk):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wf = _unpack_block(w_ref[:], fmt, bk, group)
    # group-factored scales (see _qmv_kernel)
    x = x_ref[:].astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.float32)
    for g in range(bk // group):
        d = jnp.dot(x[:, g * group:(g + 1) * group],
                    wf[g * group:(g + 1) * group, :],
                    preferred_element_type=jnp.float32)
        acc_ref[:] += d * s[g:g + 1, :]

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# learned-codebook (LUT) kernels — the CU_Q42X_LUT analog
# (reference quantizer.cu:586-655 fuses its 16-entry LUT dequant into the
# GEMM; here the book rides a [K, 2^bits] f32 VMEM operand so BOTH the
# per-tensor k-means book (rows identical) and the per-row MINI books
# dequantize with the same select chain)
# ---------------------------------------------------------------------------

def _unpack_block_book(codes, fmt, rows, group, book):
    """Like _unpack_block, but decode values come from ``book``
    [rows, 2^bits] f32 instead of the global NF constants: a select
    chain where entry i broadcasts its per-row column book[:, i:i+1]."""
    bits = fmt.pack_bits
    cpb = fmt.codes_per_byte
    ng, sub = rows // group, group // cpb
    c32 = codes.astype(jnp.int32).reshape(ng, sub, -1)
    mask = (1 << bits) - 1
    parts = [(c32 >> (bits * j)) & mask for j in range(cpb)]
    raw = jnp.stack(parts, axis=1).reshape(rows, -1)
    bf = book.astype(jnp.float32)
    wf = jnp.broadcast_to(bf[:, 0:1], raw.shape)
    for i in range(1, 1 << fmt.bits):
        wf = jnp.where(raw == i, bf[:, i:i + 1], wf)
    return wf.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("fmt", "group", "k"))
def _qmv_book(x, codes, scales, book, *, fmt: QFormat, group: int, k: int):
    """Decode GEMV for learned-codebook tensors: grid (N tiles, K tiles)
    with an f32 accumulator — K-tiled (unlike _qmv) so the [bk, 2^bits]
    book block stays small in VMEM."""
    n = codes.shape[-1]
    bm = x.shape[0]
    bn = 256 if n % 256 == 0 else 128
    bk = min(k, 1024)
    cpb = fmt.codes_per_byte
    nb = book.shape[-1]
    kernel = functools.partial(_qmv_book_kernel, fmt=fmt, group=group,
                               bk=bk, nt=k // bk)
    return pl.pallas_call(
        kernel,
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda j, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // cpb, bn), lambda j, t: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // group, bn), lambda j, t: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, nb), lambda j, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, t: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * k,
            bytes_accessed=bm * k * 2 + k * n // cpb + bm * n * 2
            + k * nb * 4,
            transcendentals=0,
        ),
    )(x, codes, scales, book)


def _qmv_book_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
                     fmt, group, bk, nt):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wf = _unpack_block_book(w_ref[:], fmt, bk, group, b_ref[:])
    x = x_ref[:].astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.float32)
    for g in range(bk // group):
        d = jnp.dot(x[:, g * group:(g + 1) * group],
                    wf[g * group:(g + 1) * group, :],
                    preferred_element_type=jnp.float32)
        acc_ref[:] += d * s[g:g + 1, :]

    @pl.when(t == nt - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fmt", "group", "k"))
def _qmm_book(x, codes, scales, book, *, fmt: QFormat, group: int, k: int):
    m, n = x.shape[0], codes.shape[-1]
    bm, bk = 256, 1024
    bn = 256 if n % 256 == 0 else 128
    grid = (m // bm, n // bn, k // bk)
    cpb = fmt.codes_per_byte
    nb = book.shape[-1]
    kernel = functools.partial(_qmm_book_kernel, fmt=fmt, group=group,
                               bk=bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // cpb, bn), lambda i, j, t: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // group, bn), lambda i, j, t: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, nb), lambda i, j, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n // cpb + m * n * 2 + k * nb * 4,
            transcendentals=0,
        ),
    )(x, codes, scales, book)


def _qmm_book_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *,
                     fmt, group, bk):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wf = _unpack_block_book(w_ref[:], fmt, bk, group, b_ref[:])
    x = x_ref[:].astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.float32)
    for g in range(bk // group):
        d = jnp.dot(x[:, g * group:(g + 1) * group],
                    wf[g * group:(g + 1) * group, :],
                    preferred_element_type=jnp.float32)
        acc_ref[:] += d * s[g:g + 1, :]

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)
