"""Numeric & quantized-format registry.

TPU-native analog of the reference's ``typNUMBER`` dtype registry
(reference: src/g_float.hpp:112-151) which spans F32/BF16/F16/F8E5M2/F8E4M3
and packed sub-byte codes Q4/Q3/Q2/T_SIGN (2-bit ternary)/T_BINARY (1-bit).

Design notes (TPU-first):
- Sub-byte codes are packed along the *contraction* (in-feature) axis into
  int8 lanes so a packed weight tile unpacks in-register into (sublane, 128)
  vregs without cross-lane shuffles (SURVEY.md §7 hard-part #1).
- Group scales use group size 128 by default (= one MXU K-tile), so a
  dequant-fused matmul applies exactly one scale per K-tile per column
  (reference groups of 128: src/Tensor/GeQuant.cpp:375).
"""
from __future__ import annotations

import enum

import jax.numpy as jnp


class QFormat(enum.Enum):
    """Weight/number storage formats.

    Mirrors the capability set of the reference's ``typNUMBER``
    (src/g_float.hpp:112-151) plus NF (NormalFloat) codebooks
    (src/Tensor/GeQuant.cpp:732) — re-keyed for TPU packing.
    """

    F32 = "f32"
    BF16 = "bf16"
    F16 = "f16"
    F8_E4M3 = "f8_e4m3"
    F8_E5M2 = "f8_e5m2"
    INT8 = "int8"       # groupwise absmax, 1 code / byte
    INT4 = "int4"       # groupwise absmax, 2 codes / byte
    NF4 = "nf4"         # 4-bit NormalFloat codebook
    NF3 = "nf3"         # 3-bit NormalFloat codebook
    INT3 = "int3"       # stored 2 codes/byte like INT4 (range [-4,3])
    INT2 = "int2"       # 4 codes / byte
    TERNARY = "ternary"  # {-1,0,+1}, 4 codes / byte (2b each), per-group scale
    BINARY = "binary"    # {-1,+1}, 8 codes / byte, per-group scale
    QJL = "qjl"          # KV-only: sign-of-JL-projection keys + norms
                         # (reference Q_JL research mode, quantizer.cu:844)

    @property
    def bits(self) -> int:
        return _BITS[self]

    @property
    def is_sub_byte(self) -> bool:
        return self in _SUB_BYTE

    @property
    def is_quantized(self) -> bool:
        return self in _QUANTIZED

    @property
    def is_codebook(self) -> bool:
        return self in (QFormat.NF4, QFormat.NF3)

    @property
    def codes_per_byte(self) -> int:
        assert self.is_sub_byte
        return 8 // _PACK_BITS[self]

    @property
    def pack_bits(self) -> int:
        """Bits used per code in the packed byte (int3 is stored in 4 bits)."""
        return _PACK_BITS[self]

    @property
    def jnp_dtype(self):
        """Storage dtype for the (packed) code array."""
        if self in _QUANTIZED:
            return jnp.int8 if self is QFormat.INT8 else jnp.uint8
        return _FLOAT_DTYPES[self]


_BITS = {
    QFormat.F32: 32, QFormat.BF16: 16, QFormat.F16: 16,
    QFormat.F8_E4M3: 8, QFormat.F8_E5M2: 8,
    QFormat.INT8: 8, QFormat.INT4: 4, QFormat.NF4: 4, QFormat.NF3: 3,
    QFormat.INT3: 3, QFormat.INT2: 2, QFormat.TERNARY: 2, QFormat.BINARY: 1,
}
# Storage bits per code once packed (int3/nf3 round up to a 4-bit nibble so
# unpack stays a shift+mask with no cross-byte codes).
_PACK_BITS = {
    QFormat.INT4: 4, QFormat.NF4: 4, QFormat.NF3: 4, QFormat.INT3: 4,
    QFormat.INT2: 2, QFormat.TERNARY: 2, QFormat.BINARY: 1,
}
_SUB_BYTE = frozenset(_PACK_BITS)
_QUANTIZED = frozenset(
    {QFormat.INT8} | _SUB_BYTE
)
_FLOAT_DTYPES = {
    QFormat.F32: jnp.float32, QFormat.BF16: jnp.bfloat16, QFormat.F16: jnp.float16,
    QFormat.F8_E4M3: jnp.float8_e4m3fn, QFormat.F8_E5M2: jnp.float8_e5m2,
}

#: default quantization group size along the in-feature axis — one MXU K-tile
DEFAULT_GROUP = 128


def qformat_from_bits(bits: int, nf: bool = False) -> QFormat:
    """Map a ``bits`` field from a reference-style quantizer card to a format.

    Mirrors QUANT_CARD bit handling (reference: src/CLI_params.hpp:509-554).
    """
    table = {
        16: QFormat.BF16, 8: QFormat.INT8,
        4: QFormat.NF4 if nf else QFormat.INT4,
        3: QFormat.NF3 if nf else QFormat.INT3,
        2: QFormat.TERNARY, 1: QFormat.BINARY,
    }
    if bits not in table:
        raise ValueError(f"unsupported quant bits: {bits}")
    return table[bits]
