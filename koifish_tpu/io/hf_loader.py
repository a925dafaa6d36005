"""HF checkpoint ↔ koifish_tpu param-tree mapping.

The analog of the reference's per-tensor HF ingestion
(``SAFETENSOR2Gensors`` → ``GTensor::LoadParam``,
src/Manifold/Serialize.cpp:772, :145). HF linears store [out, in]; our
canonical layout is [in, out] (y = x @ w), so matrices transpose on load.
GPT2 uses Conv1D ([in, out] already) and a fused c_attn — split here.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard
from koifish_tpu.io.safetensors import iter_hf_folder


def load_hf_model(folder: str, card: Optional[ModelCard] = None,
                  dtype=jnp.bfloat16):
    """Returns (card, params) from a HF model directory."""
    if card is None:
        with open(os.path.join(folder, "config.json")) as f:
            card = ModelCard.from_hf(json.load(f))
    raw = dict(iter_hf_folder(folder))
    from koifish_tpu.quant.awq import convert_awq_weights, is_awq_checkpoint
    if is_awq_checkpoint(raw):
        # vendor AWQ: unpack to native QTensors at load (reference keeps the
        # vendor layout + a dedicated kernel, quantizer.cu:290; we normalize)
        raw = convert_awq_weights(raw)
    if card.arch == "GPT2":
        params = _map_gpt2(card, raw, dtype)
    else:
        params = _map_llama_family(card, raw, dtype)
    return card, params


def load_kun_model(path: str, dtype=jnp.bfloat16):
    """Load a reference-produced ``.kun`` single-file model: the embedded
    msgpack config (Safetensors.hpp:92-119) provides the ModelCard; the
    bf16 tensors (HF naming, Serialize.cpp) map like an HF folder.
    Returns (card, params, config_json)."""
    from koifish_tpu.io.kun import read_kun
    config, ktensors = read_kun(path)
    if config is None:
        raise ValueError(f"{path}: no embedded __koifish__config__ — "
                        "not a .kun file (plain safetensors? use load_hf_model)")
    card = ModelCard.from_json(config.get("model", {}))
    raw = {}
    for name, kt in ktensors.items():
        if kt.gama is not None or kt.data.ndim != len(kt.shape):
            raise NotImplementedError(
                f"{name}: packed/quantized .kun tensors need the quant "
                f"rules from the config — dequantize with the reference "
                f"or export HF-format for now")
        raw[name] = np.asarray(kt.data)
    if card.arch == "GPT2":
        params = _map_gpt2(card, raw, dtype)
    else:
        params = _map_llama_family(card, raw, dtype)
    return card, params, config


def _j(a, dtype, transpose=False):
    from koifish_tpu.quant.qtensor import QTensor
    if isinstance(a, QTensor):
        return a  # AWQ import: already [in, out] packed — no transpose
    arr = np.ascontiguousarray(a.T if transpose else a)
    return jnp.asarray(arr).astype(dtype)


def _map_llama_family(card: ModelCard, raw: Dict[str, np.ndarray], dtype,
                      ) -> Dict[str, Any]:
    """Qwen2/Qwen3/LLaMA/Mistral naming: model.layers.N.self_attn.q_proj..."""
    p: Dict[str, Any] = {
        "wte": _j(raw["model.embed_tokens.weight"], dtype),
        "ln_f": _j(raw["model.norm.weight"], dtype),
    }
    if not card.tie_embeddings:
        head = raw.get("lm_head.weight")
        if head is None:  # some exports tie implicitly
            head = raw["model.embed_tokens.weight"]
        p["head"] = _j(head, dtype, transpose=True)    # [V,E] -> [E,V]
    layers = []
    for i in range(card.n_layer):
        pre = f"model.layers.{i}."
        lp: Dict[str, Any] = {
            "ln1": _j(raw[pre + "input_layernorm.weight"], dtype),
            "q": _j(raw[pre + "self_attn.q_proj.weight"], dtype, True),
            "k": _j(raw[pre + "self_attn.k_proj.weight"], dtype, True),
            "v": _j(raw[pre + "self_attn.v_proj.weight"], dtype, True),
            "o": _j(raw[pre + "self_attn.o_proj.weight"], dtype, True),
            "ln2": _j(raw[pre + "post_attention_layernorm.weight"], dtype),
        }
        if card.n_experts > 0 and (pre + "mlp.gate.weight") in raw:
            # Qwen3-MoE: router + stacked experts
            lp["router"] = _j(raw[pre + "mlp.gate.weight"], dtype, True)
            def stack(part):
                return jnp.stack([
                    _j(raw[f"{pre}mlp.experts.{e}.{part}.weight"], dtype, True)
                    for e in range(card.n_experts)])
            lp["egate"] = stack("gate_proj")
            lp["eup"] = stack("up_proj")
            lp["edown"] = stack("down_proj")
        else:
            lp["gate"] = _j(raw[pre + "mlp.gate_proj.weight"], dtype, True)
            lp["up"] = _j(raw[pre + "mlp.up_proj.weight"], dtype, True)
            lp["down"] = _j(raw[pre + "mlp.down_proj.weight"], dtype, True)
        if card.qkv_bias:
            lp["q_b"] = _j(raw[pre + "self_attn.q_proj.bias"], dtype)
            lp["k_b"] = _j(raw[pre + "self_attn.k_proj.bias"], dtype)
            lp["v_b"] = _j(raw[pre + "self_attn.v_proj.bias"], dtype)
        if card.qk_norm:
            lp["qn"] = _j(raw[pre + "self_attn.q_norm.weight"], dtype)
            lp["kn"] = _j(raw[pre + "self_attn.k_norm.weight"], dtype)
        layers.append(lp)
    p["layers"] = layers
    return p


def _map_gpt2(card: ModelCard, raw: Dict[str, np.ndarray], dtype,
              ) -> Dict[str, Any]:
    """GPT2 naming (Conv1D = [in, out] already; fused c_attn split 3-way)."""
    def g(name):  # some exports prefix "transformer."
        return raw.get(name, raw.get("transformer." + name))

    E = card.n_embd
    p: Dict[str, Any] = {
        "wte": _j(g("wte.weight"), dtype),
        "wpe": _j(g("wpe.weight"), dtype),
        "ln_f": _j(g("ln_f.weight"), dtype),
        "ln_f_b": _j(g("ln_f.bias"), dtype),
    }
    layers = []
    for i in range(card.n_layer):
        pre = f"h.{i}."
        ca_w = np.asarray(g(pre + "attn.c_attn.weight"))   # [E, 3E]
        ca_b = np.asarray(g(pre + "attn.c_attn.bias"))
        lp = {
            "ln1": _j(g(pre + "ln_1.weight"), dtype),
            "ln1_b": _j(g(pre + "ln_1.bias"), dtype),
            "q": _j(ca_w[:, :E], dtype),
            "k": _j(ca_w[:, E:2 * E], dtype),
            "v": _j(ca_w[:, 2 * E:], dtype),
            "q_b": _j(ca_b[:E], dtype),
            "k_b": _j(ca_b[E:2 * E], dtype),
            "v_b": _j(ca_b[2 * E:], dtype),
            "o": _j(g(pre + "attn.c_proj.weight"), dtype),
            "o_b": _j(g(pre + "attn.c_proj.bias"), dtype),
            "ln2": _j(g(pre + "ln_2.weight"), dtype),
            "ln2_b": _j(g(pre + "ln_2.bias"), dtype),
            "fc": _j(g(pre + "mlp.c_fc.weight"), dtype),
            "fc_b": _j(g(pre + "mlp.c_fc.bias"), dtype),
            "proj": _j(g(pre + "mlp.c_proj.weight"), dtype),
            "proj_b": _j(g(pre + "mlp.c_proj.bias"), dtype),
        }
        layers.append(lp)
    p["layers"] = layers
    return p
