"""BROWN attention — learned fixed-attention (synthesizer-style) layer.

Analog of the reference's ``BROWN_attn`` neuron (src/Manifold/
TGraph.cpp:400-489, Neuron.hpp:632-650; selected by ``attn_type:
"brown"`` — gLLM.cpp:79 — or a ``{"BROWN": []}`` backbone node,
Neuron.cpp:35-36). The design: attention *probabilities* are a learned
per-head [T, T] parameter (``Q.BuildX(name+".tmp", {T,T,n_head,B})``,
TGraph.cpp:411 — a "transition as property", i.e. a dense-synthesizer
attention matrix), not computed from the tokens; the values are the
normed embedding reshaped into heads and RoPE-rotated
(TGraph.cpp:428-441), with no V projection. Per layer::

    h    = norm(x)
    v    = rope(reshape(h, [B, T, H, D]))          # heads ARE the channels
    prob = softmax(causal_mask(W_attn * 1/sqrt(D)))  # learned [H, T, T]
    y    = x + proj(reshape(prob @ v, [B, T, E]))  # proj_cat, TGraph.cpp:412

followed by the layer's ordinary FFN/MoE block (the backbone keeps the
mlp neuron). TPU notes: ``prob @ v`` is an [T,T]x[T,D] MXU batched dot
per head; the learned logits are masked with a -inf triangle and
softmaxed in f32 once per step (XLA hoists the token-independent
``prob`` out of nothing here — it is recomputed per step, which is
correct since W_attn is trained).

The learned table is sized [H, n_ctx, n_ctx] and sliced to the traced T,
so shorter sequences share the table prefix (the reference builds it at
exactly T = config ctx).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.ops.matmul import qmatmul
from koifish_tpu.ops.rope import apply_rope


def init_brown_layer(card: ModelCard, key: jax.Array, dtype=jnp.bfloat16):
    """Parameter leaves for one BROWN attention (names mirror the
    reference's members: the learned transition ``Q`` and ``proj_cat``)."""
    E, H, T = card.n_embd, card.n_head, card.n_ctx
    if H * card.head_dim != E:
        raise ValueError(
            f"BROWN attention reshapes the embedding into heads directly "
            f"(no V projection, TGraph.cpp:428): needs n_head*head_dim == "
            f"n_embd, got {H}*{card.head_dim} != {E}")
    k1, k2 = jax.random.split(key)
    import math
    std = 0.02
    return {
        # learned attention logits, softmaxed at use (ref Q.w "transition
        # as property"). f32: it feeds a softmax, and is tiny vs the MXU
        # dots it drives.
        "brown_w": jax.random.normal(k1, (H, T, T), jnp.float32) * std,
        "brown_proj": (jax.random.normal(k2, (E, E), jnp.float32)
                       * std / math.sqrt(2 * card.n_layer)).astype(dtype),
    }


def brown_attn(card: ModelCard, lp, x: jax.Array, cos, sin,
               positions) -> jax.Array:
    """x [B, T, E] -> x + BROWN attention output (pre-FFN residual)."""
    from koifish_tpu.models.transformer import _norm

    B, T, E = x.shape
    H, D = card.n_head, card.head_dim
    h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
    v = h.reshape(B, T, H, D)
    if card.pos_embed == "rope":
        v = apply_rope(v, cos, sin, positions)
    # learned logits -> causal-masked softmax (ggml_diag_mask_inf +
    # soft_max, TGraph.cpp:449-452), f32 for the exp
    w = lp["brown_w"][:, :T, :T].astype(jnp.float32) / (D ** 0.5)
    if card.causal:
        tri = jnp.tril(jnp.ones((T, T), bool))
        w = jnp.where(tri[None], w, -jnp.inf)
    prob = jax.nn.softmax(w, axis=-1).astype(x.dtype)       # [H, T, T]
    # out[b,t,h,:] = sum_s prob[h,t,s] * v[b,s,h,:] — batched MXU dot
    wv = jnp.einsum("hts,bshd->bthd", prob, v)
    y = qmatmul(wv.reshape(B, T, E), lp["brown_proj"])
    return x + y
