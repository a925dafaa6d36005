"""Sub-byte code packing for TPU-friendly layouts.

Codes pack along the *contraction* (axis 0 / in-feature) axis in
**group-local block-split** order: within each quantization group of
``group`` rows, byte row r holds codes for rows ``r``, ``r + group/cpb``,
``r + 2·group/cpb``, … (one per nibble slot). Unpacking a group is then
``cpb`` shifted copies of CONTIGUOUS row blocks — no per-row interleave
(a sublane shuffle that measured as the dominant cost of fused-dequant
GEMV on the VPU). Any K-tile that is a multiple of ``group`` contains
whole groups, so tiled kernels unpack locally.

This is the TPU analog of the reference's 128-bit packed formats
(reference: src/Device/CUDA/kernel/packedN.cuh, _bit_utils.cuh:3-83) and
of AWQ's reordered packing trick (AWQ_ORDER) — pick the pack order at
quantize time so the unpack matches the hardware's fast path
(SURVEY.md §7 hard-part #1).
"""
from __future__ import annotations

import jax.numpy as jnp

from koifish_tpu.dtypes import QFormat


def pack_codes(codes: jnp.ndarray, fmt: QFormat, group: int = 128,
               ) -> jnp.ndarray:
    """Pack unsigned codes (< 2**fmt.pack_bits) along axis 0 into uint8.

    codes: [n, ...] integer array, n divisible by ``group`` (or by
    codes_per_byte when n < group — degenerate single-group case).
    Returns [n / cpb, ...] uint8.
    """
    if not fmt.is_sub_byte:
        return codes.astype(fmt.jnp_dtype)
    bits = fmt.pack_bits
    cpb = fmt.codes_per_byte
    n = codes.shape[0]
    if n % group:
        group = n                      # single-group fallback
    if group % cpb or n % group:
        raise ValueError(f"axis-0 length {n} / group {group} not packable "
                         f"for {fmt}")
    sub = group // cpb
    rest = codes.shape[1:]
    c = codes.astype(jnp.uint8).reshape((n // group, cpb, sub) + rest)
    out = jnp.zeros((n // group, sub) + rest, dtype=jnp.uint8)
    for j in range(cpb):
        out = out | (c[:, j] << (bits * j))
    return out.reshape((n // cpb,) + rest)


def unpack_codes(packed: jnp.ndarray, fmt: QFormat, n: int,
                 group: int = 128) -> jnp.ndarray:
    """Inverse of :func:`pack_codes`. Returns [n, ...] uint8 codes."""
    if not fmt.is_sub_byte:
        return packed
    bits = fmt.pack_bits
    cpb = fmt.codes_per_byte
    if n % group:
        group = n
    sub = group // cpb
    mask = jnp.uint8((1 << bits) - 1)
    rest = packed.shape[1:]
    p = packed.reshape((n // group, sub) + rest)
    parts = [(p >> (bits * j)) & mask for j in range(cpb)]
    # [ng, cpb, sub, ...] -> [n, ...]: contiguous block copies per group
    return jnp.stack(parts, axis=1).reshape((n,) + rest)
