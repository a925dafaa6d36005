"""QTensor — a quantized weight as a JAX pytree node.

TPU-native analog of the reference's quantized ``GTensor`` (packed bits +
per-group "gama" scales, reference: src/Tensor/GTensor.hpp:204-268). The
codes/scales are leaves (shardable jax.Arrays); format metadata is static
aux data so jit specializes per format.

Canonical weight layout is **[in, out]** (``y = x @ w``): the contraction
axis is axis 0, groups tile axis 0, packing packs axis 0. ``scales`` is
``[in/group, out]``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from koifish_tpu.dtypes import DEFAULT_GROUP, QFormat
from koifish_tpu.quant.packing import unpack_codes

# NF4 codebook (QLoRA NormalFloat-4): quantiles of N(0,1) normalized to
# [-1, 1] with an exact zero. Same codebook family as the reference's
# RT_NormalF (src/Tensor/GeQuant.cpp:732).
NF4_VALUES = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
# NF3: 8-level NormalFloat (quantiles of N(0,1), zero included, normalized).
NF3_VALUES = (
    -1.0, -0.5350227355957031, -0.2469314038753510, 0.0,
    0.1833375245332718, 0.3819939494132996, 0.6229856610298157, 1.0,
)


class _LazyCodebook:
    """Device array built on first use — a module-level jnp.array would
    initialize the XLA backend at import time, which breaks
    jax.distributed.initialize ordering in multi-process runs."""

    def __init__(self, values):
        self._values = values
        self._arr = None

    def get(self) -> jnp.ndarray:
        if self._arr is None:
            self._arr = jnp.array(self._values, dtype=jnp.float32)
        return self._arr

    def __getitem__(self, idx):
        return self.get()[idx]

    def __jax_array__(self):
        return self.get()


NF4_CODEBOOK = _LazyCodebook(NF4_VALUES)
NF3_CODEBOOK = _LazyCodebook(NF3_VALUES)


def codebook_for(fmt: QFormat) -> jnp.ndarray:
    if fmt is QFormat.NF4:
        return NF4_CODEBOOK.get()
    if fmt is QFormat.NF3:
        return NF3_CODEBOOK.get()
    raise ValueError(f"{fmt} has no codebook")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    """Packed quantized tensor + per-group scales.

    codes:  packed code array — [ceil(in*pack_bits/8), out] uint8 for
            sub-byte formats, [in, out] int8 for INT8.
    scales: [in/group, out] per-group scales (f32 or bf16).
    zeros:  optional [in/group, out] zero-points (asymmetric modes).
    """

    codes: jax.Array
    scales: jax.Array
    zeros: Optional[jax.Array] = None
    fmt: QFormat = dataclasses.field(default=QFormat.INT8, metadata=dict(static=True))
    shape: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    group: int = dataclasses.field(default=DEFAULT_GROUP, metadata=dict(static=True))
    # learned per-tensor codebook (k-means / Q_Cluster mode) — overrides
    # the global NF codebooks when set
    codebook: Optional[jax.Array] = None
    # per-in-row scale from Sinkhorn normalization (SinkNormal mode);
    # folds into activations: y = (x * row_scale) @ deq(codes)
    row_scale: Optional[jax.Array] = None

    @property
    def in_features(self) -> int:
        return self.shape[0]

    @property
    def out_features(self) -> int:
        return self.shape[-1]

    @property
    def n_groups(self) -> int:
        return self.scales.shape[0]

    def nbytes(self) -> int:
        n = self.codes.size * self.codes.dtype.itemsize
        n += self.scales.size * self.scales.dtype.itemsize
        if self.zeros is not None:
            n += self.zeros.size * self.zeros.dtype.itemsize
        return n

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Reference (jnp) dequantization — the correctness oracle.

        Mirrors ``GTensor::GetDataX`` dispatch semantics
        (reference: src/Device/CUDA/kernel/quantizer.cu:249-392) but as a
        pure function; the fused fast path lives in ops/matmul.py.
        """
        fmt = self.fmt
        n_in = self.shape[0]
        if fmt in (QFormat.INT8, QFormat.F8_E5M2, QFormat.F8_E4M3):
            # byte-wide codes stored unpacked [in, out] (fp8: the F8Ex
            # analog — XLA fuses the f32 upcast + scale into the dot)
            codes = self.codes.astype(jnp.float32)
        else:
            raw = unpack_codes(self.codes, fmt, n_in, group=self.group)
            if self.codebook is not None and self.codebook.ndim == 2:
                # per-ROW learned codebooks (MINI / Q_Impurity analog,
                # quant/cluster.quantize_mini): book[row, code]
                codes = jnp.take_along_axis(
                    self.codebook.astype(jnp.float32),
                    raw.astype(jnp.int32), axis=1)
            elif self.codebook is not None:
                codes = self.codebook.astype(jnp.float32)[raw.astype(jnp.int32)]
            elif fmt.is_codebook:
                codes = codebook_for(fmt)[raw.astype(jnp.int32)]
            elif fmt is QFormat.BINARY:
                codes = raw.astype(jnp.float32) * 2.0 - 1.0
            elif fmt is QFormat.TERNARY:
                codes = raw.astype(jnp.float32) - 1.0
            elif self.zeros is not None:
                codes = raw.astype(jnp.float32)   # asymmetric: unsigned codes
            else:  # signed INT4 / INT3 / INT2 stored biased by 2**(bits-1)
                bias = 1 << (fmt.bits - 1)
                codes = raw.astype(jnp.float32) - float(bias)
        g = self.group
        codes = codes.reshape(self.n_groups, g, -1)
        w = codes * self.scales.astype(jnp.float32)[:, None, :]
        if self.zeros is not None:
            w = w + self.zeros.astype(jnp.float32)[:, None, :]
        w = w.reshape(self.shape)
        if self.row_scale is not None:   # Sinkhorn row factors
            w = w * self.row_scale.astype(jnp.float32)[:, None]
        return w.astype(dtype)
