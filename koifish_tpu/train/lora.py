"""LoRA adapters + SFT trainable-parameter selection.

Reference analogs: ``HIERARCH_LorAB`` low-rank adapters on any weight
(src/Manifold/Neuron.hpp:60-86, rhs = b(a·x)) and the SFT_CARD tuning
methods FULL/BitFit/OnlyAttention/OnlyHead (src/CLI_params.hpp:449-474).

A LoRA adapter for weight ``w`` ([in, out]) is ``lp[key + "_lora"] =
{"a": [in, r], "b": [r, out]}`` with the alpha/r scaling folded into the
init of ``a`` (b is zero-init so the model starts at the base weights).
The forward hook lives in models/transformer.py:_maybe_lora.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from koifish_tpu.config import SFTCard
from koifish_tpu.quant.qtensor import QTensor

_KEY_TO_TARGET = {"q": "wq", "k": "wk", "v": "wv", "o": "wo",
                  "gate": "wgate", "up": "wup", "down": "wdown",
                  "fc": "wfc", "proj": "wproj"}


def add_lora(params: Dict[str, Any], sft: SFTCard, key: jax.Array,
             dtype=jnp.bfloat16) -> Dict[str, Any]:
    out = dict(params)
    new_layers = []
    r = sft.lora_rank
    scale = sft.lora_alpha / r
    for lp in params["layers"]:
        nlp = dict(lp)
        for name, w in lp.items():
            tgt = _KEY_TO_TARGET.get(name)
            if tgt is None or tgt not in sft.lora_targets:
                continue
            shape = w.shape if not isinstance(w, QTensor) else w.shape
            if len(shape) != 2:
                continue
            key, sub = jax.random.split(key)
            a = (jax.random.normal(sub, (shape[0], r), jnp.float32)
                 * (scale / shape[0] ** 0.5)).astype(dtype)
            b = jnp.zeros((r, shape[1]), dtype)
            nlp[name + "_lora"] = {"a": a, "b": b}
        new_layers.append(nlp)
    out["layers"] = new_layers
    return out


def merge_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold adapters into base weights (bf16 bases only)."""
    out = dict(params)
    new_layers = []
    for lp in params["layers"]:
        nlp = {}
        for name, w in lp.items():
            if name.endswith("_lora"):
                continue
            lora = lp.get(name + "_lora")
            if lora is not None and not isinstance(w, QTensor):
                delta = (lora["a"].astype(jnp.float32)
                         @ lora["b"].astype(jnp.float32))
                w = (w.astype(jnp.float32) + delta).astype(w.dtype)
            nlp[name] = w
        new_layers.append(nlp)
    out["layers"] = new_layers
    return out


def trainable_mask(params: Dict[str, Any], method: str) -> Any:
    """Same-structure tree of bool: which leaves receive updates
    (SFT_CARD::isFixWeight analog)."""
    method = method.lower()

    def leaf_mask(name: str, in_layer: bool, w) -> bool:
        if method == "full":
            return True
        if method == "lora":
            return name.endswith("_lora")
        if method == "bitfit":
            return name.endswith("_b") or name.startswith("ln") or \
                name in ("qn", "kn")
        if method in ("onlyattention", "only_attention"):
            return in_layer and name.split("_")[0] in ("q", "k", "v", "o",
                                                       "qn", "kn", "ln1")
        if method in ("onlyhead", "only_head"):
            return name in ("head", "wte", "ln_f", "ln_f_b")
        if method in ("onlyscale", "only_scale", "gama"):
            return False  # QTensor scales are handled by dtype (float) rule
        return True

    def expand(name, in_layer, w):
        flag = leaf_mask(name, in_layer, w)
        return jax.tree_util.tree_map(lambda _: flag, w)

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = [{n: expand(n, True, w) for n, w in lp.items()}
                      for lp in v]
        else:
            out[k] = expand(k, False, v)
    return out
