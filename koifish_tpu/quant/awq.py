"""AWQ checkpoint import → QTensor.

The reference uploads vendor-AWQ tensors as-is and dequantizes with a
dedicated kernel (``CU_Q42X_awq``, src/Device/CUDA/kernel/quantizer.cu:290;
unpack order per src/Python/test_awq.py:32-66). Here AWQ triples
(qweight/qzeros/scales) are unpacked once at load into the native packed
QTensor layout, so every downstream kernel sees one format.

AWQ GEMM format:
- qweight: int32 [in, out/8] — eight 4-bit codes per int32, column order
  [0, 2, 4, 6, 1, 3, 5, 7] (the "AWQ order")
- qzeros:  int32 [in/group, out/8] — same packing, per-group zero points
- scales:  f16  [in/group, out]
- dequant: w[i, j] = (code[i, j] - zero[i//g, j]) * scale[i//g, j]
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from koifish_tpu.dtypes import QFormat
from koifish_tpu.quant.packing import pack_codes
from koifish_tpu.quant.qtensor import QTensor

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def _unpack_int32_awq(packed: np.ndarray) -> np.ndarray:
    """[rows, cols/8] int32 -> [rows, cols] uint8 codes in logical order."""
    rows, c8 = packed.shape
    out = np.empty((rows, c8, 8), np.uint8)
    p = packed.astype(np.uint32)
    for slot in range(8):
        out[:, :, AWQ_ORDER[slot]] = (p >> (4 * slot)) & 0xF
    return out.reshape(rows, c8 * 8)


def awq_to_qtensor(qweight: np.ndarray, qzeros: np.ndarray,
                   scales: np.ndarray) -> QTensor:
    """Convert one AWQ triple into an asymmetric INT4 QTensor [in, out]."""
    import jax.numpy as jnp

    codes = _unpack_int32_awq(np.asarray(qweight))          # [in, out]
    zeros_codes = _unpack_int32_awq(np.asarray(qzeros))     # [in/g, out]
    scale = np.asarray(scales, np.float32)                  # [in/g, out]
    n_in, n_out = codes.shape
    group = n_in // scale.shape[0]
    # QTensor asymmetric dequant: w = codes*scale + zeros_offset
    zeros_offset = -zeros_codes.astype(np.float32) * scale
    packed = pack_codes(jnp.asarray(codes), QFormat.INT4, group=group)
    return QTensor(codes=packed, scales=jnp.asarray(scale),
                   zeros=jnp.asarray(zeros_offset), fmt=QFormat.INT4,
                   shape=(n_in, n_out), group=group)


def is_awq_checkpoint(raw: Dict[str, np.ndarray]) -> bool:
    return any(k.endswith(".qweight") for k in raw)


def convert_awq_weights(raw: Dict[str, np.ndarray]) -> Dict[str, object]:
    """Replace every (qweight, qzeros, scales) triple in a raw HF tensor
    dict with '<prefix>.weight' -> QTensor; other tensors pass through."""
    out: Dict[str, object] = {}
    done = set()
    for name in raw:
        if name.endswith(".qweight"):
            prefix = name[: -len(".qweight")]
            qt = awq_to_qtensor(raw[name], raw[prefix + ".qzeros"],
                                raw[prefix + ".scales"])
            out[prefix + ".weight"] = qt
            done.update({name, prefix + ".qzeros", prefix + ".scales"})
    for name, arr in raw.items():
        if name not in done and name not in out:
            out[name] = arr
    return out
