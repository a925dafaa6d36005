"""Quantization-aware matmul.

The reference decodes by dequantizing packed weights into a shared bf16
scratch then calling cublasLt (``GetDataX`` + ``CU_mm_blasLt``,
reference: src/Device/CUDA/kernel/quantizer.cu:249, gemm.cu:93 — i.e.
dequant-to-scratch, NOT fused). The TPU rebuild goes one better:
``qmatmul`` lowers to a Pallas dequant-fused matmul on TPU
(ops/pallas/matmul.py) and to a dequant+dot XLA path elsewhere — XLA
fuses the unpack/scale elementwise chain into the dot's operand anyway,
so the "ref" path is already fused-ish on TPU.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from koifish_tpu.quant.qtensor import QTensor

Weight = Union[jax.Array, QTensor]

# backend switch: "auto" uses Pallas on TPU when the shape qualifies
_BACKEND = "auto"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "ref", "pallas")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def _dequant(w: Weight, dtype) -> jax.Array:
    if isinstance(w, QTensor):
        return w.dequantize(dtype)
    return w.astype(dtype)


def qmatmul(x: jax.Array, w: Weight, out_dtype=None) -> jax.Array:
    """``x @ w`` with ``w`` possibly quantized. x: [..., in], w: [in, out]."""
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QTensor) and w.row_scale is not None:
        # Sinkhorn row factors fold into the activations (free fusion):
        # y = x @ (r . wq) = (x * r) @ wq
        import dataclasses
        x = (x.astype(jnp.float32) * w.row_scale.astype(jnp.float32)
             ).astype(x.dtype)
        w = dataclasses.replace(w, row_scale=None)
    if isinstance(w, QTensor) and _BACKEND != "ref" and w.codebook is None:
        from koifish_tpu.ops.pallas import matmul as pmm
        y = pmm.qmatmul_pallas_or_ref(x, w, out_dtype)
        return y
    if not isinstance(w, QTensor):
        # int8-forward training (FP8-GEMM analog; TrainCard.int8_matmul).
        # Size-gated: dynamic quant passes only pay for themselves on
        # head-sized weights (see ops/int8_train.py). The policy is a
        # trace-scoped object pushed by make_train_step (ops/tracectx.py).
        from koifish_tpu.ops.tracectx import current_int8
        pol = current_int8()
        if pol is not None and pol.applies(w.shape):
            from koifish_tpu.ops.int8_train import int8_matmul
            return int8_matmul(x, w, pol.wgrad, pol.dgrad).astype(out_dtype)
    wd = _dequant(w, x.dtype)
    # emit the dot at the target dtype directly: dot->f32->convert(bf16)
    # leaves an f32 alias that XLA happily re-uses for other consumers —
    # for the lm head that materialized f32[B,T,V] logits (3.3 GB on
    # GPT2) purely to feed the CE reductions. MXU accumulation is f32
    # internally either way.
    pref = out_dtype if jnp.dtype(out_dtype).itemsize <= 2 else jnp.float32
    return jnp.dot(x, wd, preferred_element_type=pref).astype(out_dtype)


def linear(x: jax.Array, w: Weight, b: Optional[jax.Array] = None,
           out_dtype=None) -> jax.Array:
    """SLP analog (reference: src/Manifold/Neuron.hpp:397-430)."""
    y = qmatmul(x, w, out_dtype=out_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
