"""Quantize-at-load: apply a QuantCard to a model param pytree.

The analog of the reference's load-time quantization sweep
(``Serial_Quant_MMAP`` → ``GeQuant::LowBit_worker``,
src/Device/CUDA/huTensor.cu:487, src/Tensor/GeQuant.cpp:830-905): each
eligible 2-D weight whose HF-style path matches a QuantCard rule is
replaced in-place by a packed QTensor.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from koifish_tpu.config import ModelCard, QuantCard
from koifish_tpu.quant.rtn import quantize_jit

# param-key -> HF-style path fragment, so reference quantizer configs
# ("self_attn": {...}, "mlp": {...}, qwen3_596M_q4.json:3-8) match.
_KEY_PATH = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
    "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
    "fc": "mlp.c_fc", "proj": "mlp.c_proj",
    "wte": "embed_tokens", "head": "lm_head",
}


def param_path(layer_idx: Optional[int], key: str) -> str:
    frag = _KEY_PATH.get(key, key)
    if layer_idx is None:
        return f"model.{frag}"
    return f"model.layers.{layer_idx}.{frag}"


def quantize_params(params: Dict[str, Any], qcard: QuantCard,
                    card: Optional[ModelCard] = None) -> Dict[str, Any]:
    """Returns a new param tree with rule-matched weights as QTensors."""
    out = dict(params)

    def maybe_quant(w, path, head_layout=False):
        rule = qcard.rule_for(path)
        if rule is None or not hasattr(w, "ndim") or w.ndim != 2:
            return w
        mat = w.T if head_layout else w       # embeddings -> head layout [E,V]
        if mat.shape[0] % rule.group:
            return w
        if rule.method in ("CLUSTER", "KMEANS"):
            from koifish_tpu.quant.cluster import quantize_kmeans
            return quantize_kmeans(jnp.asarray(mat), bits=rule.fmt.bits,
                                   group=rule.group)
        if rule.method in ("MINI", "MINI_GBDT"):
            from koifish_tpu.quant.cluster import quantize_mini
            return quantize_mini(jnp.asarray(mat), bits=rule.fmt.bits,
                                 group=rule.group)
        if rule.method in ("SNQ", "SINKHORN"):
            from koifish_tpu.quant.cluster import quantize_sinkhorn
            return quantize_sinkhorn(jnp.asarray(mat), rule.fmt,
                                     group=rule.group)
        # shape-cached jitted quantize: repeated layer shapes compile once
        # (64 s -> 1.5 s/tensor at 32B embed dims on CPU — rtn.quantize_jit)
        return quantize_jit(jnp.asarray(mat), rule.fmt, group=rule.group,
                            symmetric=rule.symmetric)

    new_layers = []
    for li, lp in enumerate(params["layers"]):
        nlp = dict(lp)
        for key, w in lp.items():
            if key.endswith("_b") or key in ("ln1", "ln2", "qn", "kn"):
                continue
            nlp[key] = maybe_quant(w, param_path(li, key))
        new_layers.append(nlp)
    out["layers"] = new_layers
    out["wte"] = maybe_quant(params["wte"], param_path(None, "wte"),
                             head_layout=True)
    if "head" in params:
        out["head"] = maybe_quant(params["head"], param_path(None, "head"))
    return out
