"""HotPicker — context-sparsity neuron selection for FFN inference.

Rebuild of the reference's HotPicker/CS_Picker (src/Manifold/HotPicker.hpp:36,
Neuron.hpp:265-285): observe which FFN neurons actually fire for a given
context/calibration set, then serve with only the hot subset — a
weight-slicing form of contextual sparsity (Deja Vu family).

TPU-native shape: calibration is one batched forward collecting per-neuron
activation energy; "picking" slices the gate/up/down weights to the hot
top-k columns (static shapes — the sliced model is just a smaller dense
FFN, so every kernel keeps working).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.models.transformer import (
    Params, _norm, mlp, qkv_project, gather_embed)
from koifish_tpu.ops.attention import causal_attention
from koifish_tpu.ops.matmul import qmatmul
from koifish_tpu.quant.qtensor import QTensor


def ffn_activation_energy(card: ModelCard, params: Params,
                          tokens: jax.Array) -> List[jax.Array]:
    """Per-layer mean |silu(gate)·up| per FFN neuron over a calibration
    batch — the 'hotness' statistic. tokens: [B, T]."""
    from koifish_tpu.ops.rope import rope_freqs
    B, T = tokens.shape
    positions = jnp.arange(T, dtype=jnp.int32)
    cos = sin = None
    if card.pos_embed == "rope":
        cos, sin = rope_freqs(card.head_dim, card.max_pos, card.rope_theta,
                              card.rope_scaling_dict())
    x = gather_embed(params["wte"], tokens)
    if card.pos_embed == "learned":
        x = x + jnp.take(params["wpe"], positions, axis=0)
    energies = []
    for lp in params["layers"]:
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        q, k, v = qkv_project(card, lp, h, cos, sin, positions)
        a = causal_attention(q, k, v)
        from koifish_tpu.models.transformer import _linear_l
        x = x + _linear_l(a.reshape(B, T, -1), lp, "o")
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        if "gate" in lp:
            g = qmatmul(h, lp["gate"])
            u = qmatmul(h, lp["up"])
            act = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
        else:
            act = jax.nn.gelu(
                qmatmul(h, lp["fc"]).astype(jnp.float32), approximate=True)
        energies.append(jnp.mean(jnp.abs(act), axis=(0, 1)))   # [F]
        x = x + mlp(card, lp, h)
    return energies


def _slice_cols(w, idx):
    """Slice the out axis (axis 1). QTensors pack along axis 0 (in), so the
    out axis of codes/scales/zeros slices directly — no dequantization."""
    if isinstance(w, QTensor):
        import dataclasses
        return dataclasses.replace(
            w,
            codes=jnp.take(w.codes, idx, axis=1),
            scales=jnp.take(w.scales, idx, axis=1),
            zeros=None if w.zeros is None else jnp.take(w.zeros, idx, axis=1),
            shape=(w.shape[0], int(idx.shape[0])))
    return jnp.take(w, idx, axis=1)


def _slice_rows(w, idx):
    """Slice the in axis (axis 0). For QTensors the in axis is packed and
    grouped, and hot indices aren't group-aligned — dequantize, slice,
    requantize in the same format (one-shot at pick time, same cost class
    as quantize-at-load)."""
    if isinstance(w, QTensor):
        from koifish_tpu.quant.rtn import quantize
        dense = w.dequantize(jnp.float32)[idx]
        return quantize(dense, w.fmt, group=min(w.group, dense.shape[0]),
                        symmetric=w.zeros is None,
                        scale_dtype=w.scales.dtype)
    return jnp.take(w, idx, axis=0)


def pick_hot(card: ModelCard, params: Params, energies: List[jax.Array],
             keep: float = 0.5) -> tuple:
    """Slice each layer's FFN to its hottest ``keep`` fraction of neurons.
    Returns (card', params') — a smaller dense model (bf16 FFNs only)."""
    import copy
    import dataclasses
    k = int(card.n_ffn * keep)
    k = max(128, (k // 128) * 128)          # keep MXU-aligned
    new_layers = []
    for lp, e in zip(params["layers"], energies):
        nlp = dict(lp)
        idx = jnp.argsort(e)[::-1][:k]
        idx = jnp.sort(idx)
        if "gate" in lp:
            nlp["gate"] = _slice_cols(lp["gate"], idx)
            nlp["up"] = _slice_cols(lp["up"], idx)
            nlp["down"] = _slice_rows(lp["down"], idx)
        elif "fc" in lp:
            nlp["fc"] = _slice_cols(lp["fc"], idx)
            nlp["fc_b"] = jnp.take(lp["fc_b"], idx)
            nlp["proj"] = _slice_rows(lp["proj"], idx)
        new_layers.append(nlp)
    new_params = dict(params)
    new_params["layers"] = new_layers
    new_card = dataclasses.replace(copy.copy(card), n_ffn=k) \
        if dataclasses.is_dataclass(card) else card
    return new_card, new_params
