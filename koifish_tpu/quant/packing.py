"""Sub-byte code packing for TPU-friendly layouts.

Codes are packed along the *contraction* (axis 0 / in-feature) axis:
``packed[i, j]`` holds codes ``i*cpb .. i*cpb+cpb-1`` of column ``j``.
Unpacking is a per-lane shift+mask — no cross-lane data movement — so an
unpacked tile lands directly in (sublane, 128) vreg layout.

This is the TPU analog of the reference's 128-bit packed formats
(reference: src/Device/CUDA/kernel/packedN.cuh, _bit_utils.cuh:3-83) but
keyed to lane order instead of warp order (SURVEY.md §7 hard-part #1).
"""
from __future__ import annotations

import jax.numpy as jnp

from koifish_tpu.dtypes import QFormat


def pack_codes(codes: jnp.ndarray, fmt: QFormat) -> jnp.ndarray:
    """Pack unsigned codes (< 2**fmt.pack_bits) along axis 0 into uint8.

    codes: [in, ...] integer array with axis-0 length divisible by
    ``fmt.codes_per_byte``. Returns [in / cpb, ...] uint8.
    """
    if not fmt.is_sub_byte:
        return codes.astype(fmt.jnp_dtype)
    bits = fmt.pack_bits
    cpb = fmt.codes_per_byte
    n = codes.shape[0]
    if n % cpb:
        raise ValueError(f"axis-0 length {n} not divisible by {cpb} for {fmt}")
    c = codes.astype(jnp.uint8).reshape((n // cpb, cpb) + codes.shape[1:])
    out = jnp.zeros((n // cpb,) + codes.shape[1:], dtype=jnp.uint8)
    for k in range(cpb):
        out = out | (c[:, k] << (bits * k))
    return out


def unpack_codes(packed: jnp.ndarray, fmt: QFormat, n: int) -> jnp.ndarray:
    """Inverse of :func:`pack_codes`. Returns [n, ...] uint8 codes."""
    if not fmt.is_sub_byte:
        return packed
    bits = fmt.pack_bits
    cpb = fmt.codes_per_byte
    mask = jnp.uint8((1 << bits) - 1)
    parts = [(packed >> (bits * k)) & mask for k in range(cpb)]
    # [in/cpb, cpb, ...] -> [in, ...]
    stacked = jnp.stack(parts, axis=1)
    return stacked.reshape((packed.shape[0] * cpb,) + packed.shape[1:])[:n]
