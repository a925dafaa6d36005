"""Mixture-of-Experts FFN (Qwen3-MoE family).

The reference has a single-device MOE neuron (src/Manifold/MoE.cpp,
LLM_MOE gLLM.hpp:353-369). TPU-native rebuild: GShard-style top-k routing
with expert capacity, dispatch/combine as scatter/gather (no [Ne, C, S]
one-hot einsum blow-up), expert FFNs batched over a stacked [Ne, ...]
weight axis that shards over the mesh for expert parallelism
(SURVEY.md §2.7 EP row).

Layer params: ``router`` [E, Ne]; ``egate``/``eup`` [Ne, E, Fm];
``edown`` [Ne, Fm, E].
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard


def moe_ffn(card: ModelCard, lp: Dict[str, Any], x: jax.Array,
            capacity_factor: float = 1.25) -> jax.Array:
    B, T, E = x.shape
    S = B * T
    Ne, k = card.n_experts, card.n_experts_active
    x2 = x.reshape(S, E)

    logits = jnp.dot(x2, lp["router"].astype(x.dtype),
                     preferred_element_type=jnp.float32)        # [S, Ne]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate_v, gate_i = jax.lax.top_k(probs, k)                    # [S, k]
    gate_v = gate_v / jnp.maximum(gate_v.sum(-1, keepdims=True), 1e-9)

    C = max(int(S * k * capacity_factor / Ne), 4)
    flat_i = gate_i.reshape(-1)                                 # [S*k]
    flat_g = gate_v.reshape(-1)

    # position of each (token, slot) within its expert's capacity buffer
    onehot = jax.nn.one_hot(flat_i, Ne, dtype=jnp.int32)        # [S*k, Ne]
    pos = (jnp.cumsum(onehot, axis=0) - 1) * onehot
    slot = pos.sum(-1)                                          # [S*k]
    keep = slot < C
    slot = jnp.where(keep, slot, C - 1)

    # dispatch: scatter tokens into [Ne, C, E]
    xk = jnp.repeat(x2, k, axis=0)                              # [S*k, E]
    xk = xk * keep[:, None].astype(xk.dtype)
    buf = jnp.zeros((Ne, C, E), x.dtype)
    buf = buf.at[flat_i, slot].add(xk)

    # expert FFNs, batched over the expert axis (rides the MXU per expert)
    g = jnp.einsum("ncE,nEf->ncf", buf, lp["egate"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("ncE,nEf->ncf", buf, lp["eup"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    y = jnp.einsum("ncf,nfE->ncE", h, lp["edown"].astype(x.dtype),
                   preferred_element_type=jnp.float32)          # [Ne, C, E]

    # combine: gather each (token, slot) result, weight, sum over k
    out = y[flat_i, slot].astype(jnp.float32)                   # [S*k, E]
    out = out * (flat_g * keep.astype(jnp.float32))[:, None]
    out = out.reshape(S, k, E).sum(1)
    return out.reshape(B, T, E).astype(x.dtype)


def init_moe_layer(card: ModelCard, key: jax.Array, dtype=jnp.bfloat16,
                   ) -> Dict[str, Any]:
    E, Ne, Fm = card.n_embd, card.n_experts, card.moe_ffn or card.n_ffn
    ks = jax.random.split(key, 4)
    std = 0.02
    return {
        "router": (jax.random.normal(ks[0], (E, Ne), jnp.float32) * std
                   ).astype(dtype),
        "egate": (jax.random.normal(ks[1], (Ne, E, Fm), jnp.float32) * std
                  ).astype(dtype),
        "eup": (jax.random.normal(ks[2], (Ne, E, Fm), jnp.float32) * std
                ).astype(dtype),
        "edown": (jax.random.normal(ks[3], (Ne, Fm, E), jnp.float32) * std
                  ).astype(dtype),
    }
