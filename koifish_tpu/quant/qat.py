"""Quantization-aware training: straight-through fake-quant and
scale-only ("gama") training.

Reference analogs:
- fake-quant QAT: ``CU_FQUANT_128_`` in-path fake quantization
  (src/Device/CUDA/kernel/quantizer.cu:195-247) with master weights in
  ``shadoW`` (GTensor.hpp:251) — here the bf16 param IS the master copy
  and the forward sees ``ste_fake_quant(w)``; the straight-through
  estimator replaces the shadow-weight machinery.
- gama training: updating per-group scales instead of weights
  (``train_target: "gama"``, X_GAMA CLI_params.hpp:512, CU_adamw_Tile*
  Optimizer.cu:237-370) — here params hold QTensors whose integer codes
  are non-differentiable leaves (frozen automatically) while ``scales``
  get gradients through ``dequantize``.
"""
from __future__ import annotations

from typing import Any, Dict

import jax

from koifish_tpu.config import ModelCard, QuantCard
from koifish_tpu.dtypes import QFormat
from koifish_tpu.quant.apply import param_path
from koifish_tpu.quant.rtn import fake_quant


@jax.custom_vjp
def _ste(w, fq):
    """Forward: quantized value; backward: identity to the master weight."""
    return fq


def _ste_fwd(w, fq):
    return fq, None


def _ste_bwd(_, g):
    return g, None


_ste.defvjp(_ste_fwd, _ste_bwd)


def ste_fake_quant(w: jax.Array, fmt: QFormat, group: int = 128) -> jax.Array:
    return _ste(w, fake_quant(w, fmt, group=group))


def apply_qat(params: Dict[str, Any], qcard: QuantCard,
              card: ModelCard = None) -> Dict[str, Any]:
    """Differentiable tree-map: rule-matched weights become their
    fake-quantized values with STE gradients. Call INSIDE the loss
    function so grads flow to the master (bf16) params."""
    out = dict(params)
    new_layers = []
    for li, lp in enumerate(params["layers"]):
        nlp = dict(lp)
        for key, w in lp.items():
            if key.endswith("_b") or getattr(w, "ndim", 0) != 2:
                continue
            rule = qcard.rule_for(param_path(li, key))
            if rule is None or w.shape[0] % rule.group:
                continue
            nlp[key] = ste_fake_quant(w, rule.fmt, rule.group)
        new_layers.append(nlp)
    out["layers"] = new_layers
    return out
