"""Gated Attention Unit layer — a WORKING analog of the reference's
GatedAttention neuron (TGraph.cpp:491-545, Neuron.hpp:603-615).

NB: the reference's live ``_TENSOR_G_`` build cannot actually construct
its GAU (``Build`` asserts on attn_mode>0 and ``Ming``'s body sits in the
dead GGML branch; the shipped qwen3 config keeps ``# gattn`` commented
out). This is a functional TPU-native implementation of the design the
scaffold describes (GAU, "Transformer Quality in Linear Time",
arXiv:2202.10447): one block replaces the (attention, FFN) pair —

    h = rmsnorm(x)
    u = silu(h @ Wu)                  # [B, T, F]
    v = silu(h @ Wv)                  # [B, T, F]   (the reference's upU/upV)
    a = attention(rope(h Wq), rope(h Wk), value=v-heads)
    y = x + (u * a) @ Wd              # gating, then down (the ref's down)

The gating attention uses n_kv_head heads for BOTH q and k so the
attention output has exactly F channels to gate u with. Train/forward
only: serving a GAU stack needs a v-gate cache the reference never got
to either — engine.prefill raises loudly.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.ops.attention import causal_attention
from koifish_tpu.ops.norms import rmsnorm
from koifish_tpu.ops.rope import apply_rope


def init_gau_layer(card: ModelCard, key: jax.Array, dtype=jnp.bfloat16):
    """Parameter leaves for one GAU block (names mirror the reference's
    SLP members: upU/upV/down + the gating q/k)."""
    E, F, D = card.n_embd, card.n_ffn, card.head_dim
    H = card.n_kv_head
    if F % H:
        raise ValueError(f"GAU needs n_ffn {F} divisible by n_kv_head {H}")
    std = 0.02
    res_std = std / math.sqrt(2 * card.n_layer)
    ks = jax.random.split(key, 5)

    def nrm(k, shape, s=std):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    return {
        "upU": nrm(ks[0], (E, F)),
        "upV": nrm(ks[1], (E, F)),
        "down": nrm(ks[2], (F, E), res_std),
        "gau_q": nrm(ks[3], (E, H * D)),
        "gau_k": nrm(ks[4], (E, H * D)),
    }


def gau_block(card: ModelCard, lp, x: jax.Array, cos, sin,
              positions) -> jax.Array:
    """x [B, T, E] -> residual-added GAU output."""
    from koifish_tpu.models.transformer import _norm
    from koifish_tpu.ops.matmul import qmatmul

    B, T, E = x.shape
    F, D, H = card.n_ffn, card.head_dim, card.n_kv_head
    h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
    u = jax.nn.silu(qmatmul(h, lp["upU"]).astype(jnp.float32)).astype(x.dtype)
    v = jax.nn.silu(qmatmul(h, lp["upV"]).astype(jnp.float32)).astype(x.dtype)
    q = qmatmul(h, lp["gau_q"]).reshape(B, T, H, D)
    k = qmatmul(h, lp["gau_k"]).reshape(B, T, H, D)
    if card.pos_embed == "rope":
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
    vh = v.reshape(B, T, H, F // H)
    a = causal_attention(q, k, vh, causal=card.causal)   # [B, T, H*(F/H)]
    a = a.reshape(B, T, F)
    y = qmatmul(u * a, lp["down"])
    return x + y
