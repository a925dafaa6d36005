"""Latent-compressed MLA decode — DeepSeek's absorbed-attention form.

The standard path (models/mla.py) up-projects latents to per-head K/V and
uses the generic cache: correct, but the cache costs S·H·(dqk+dv) per
layer. This module caches only the **latents** — ``c_kv`` [S, rkv] and
the shared roped ``k_rope`` [S, dr] (what the reference's CPU decoder
stores too: `_kv_a` (kv_lora_rank + qk_rope_head_dim,),
src/Transformer/DeepSeek.cpp:108) — and absorbs the up-projections into
the attention math:

  score(h, t) = ⟨q_nope·W_uk[·,h,·], c_kv[t]⟩ + ⟨q_rope[h], k_rope[t]⟩
  out(h)      = (Σ_t p_t · c_kv[t]) · W_uv[·,h,·]

Cache per token: rkv + dr floats vs H·(dn+dr+dv) — 576 vs 24k+ for
DeepSeek-V2 dims (≈ 40× less KV memory).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.models.mla import mla_dims
from koifish_tpu.models.transformer import (
    Params, _linear_l, _norm, gather_embed, lm_head, mlp)
from koifish_tpu.ops.matmul import qmatmul
from koifish_tpu.ops.norms import rmsnorm
from koifish_tpu.ops.rope import apply_rope, rope_freqs


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLACache:
    c_kv: jax.Array     # [L, B, S, rkv]
    k_rope: jax.Array   # [L, B, S, dr]
    pos: jax.Array      # [B]

    @property
    def size(self) -> int:
        return self.c_kv.shape[2]


def mla_cache_for(card: ModelCard, batch: int, size: int) -> MLACache:
    _, rkv, _, dr, _ = mla_dims(card)
    return MLACache(
        c_kv=jnp.zeros((card.n_layer, batch, size, rkv), jnp.bfloat16),
        k_rope=jnp.zeros((card.n_layer, batch, size, dr), jnp.bfloat16),
        pos=jnp.zeros((batch,), jnp.int32))


def _latents(card: ModelCard, lp, x, positions, cos, sin):
    """x [B,T,E] -> (c_kv [B,T,rkv], k_rope [B,T,dr]) — rope at write."""
    _, rkv, _, dr, _ = mla_dims(card)
    kv_a = qmatmul(x, lp["wkv_a"])
    c = rmsnorm(kv_a[..., :rkv], lp["kv_norm_a"], eps=card.norm_eps)
    kr = apply_rope(kv_a[..., rkv:].reshape(*kv_a.shape[:-1][:2], 1, dr),
                    cos, sin, positions)[:, :, 0]
    return c, kr


def _queries(card: ModelCard, lp, x, positions, cos, sin):
    """x [B,T,E] -> (q_nope [B,T,H,dn], q_rope [B,T,H,dr])."""
    rq, _, dn, dr, _ = mla_dims(card)
    H = card.n_head
    if rq > 0:
        qa = rmsnorm(qmatmul(x, lp["wq_a"]), lp["q_norm_a"],
                     eps=card.norm_eps)
        q = qmatmul(qa, lp["wq_b"])
    else:
        q = qmatmul(x, lp["wq"])
    q = q.reshape(*x.shape[:2], H, dn + dr)
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = apply_rope(q_rope, cos, sin, positions)
    return q_nope, q_rope


def _absorbed_attention(card: ModelCard, lp, q_nope, q_rope,
                        c_kv, k_rope, valid):
    """q_* [B,H,·]; c_kv [B,S,rkv]; k_rope [B,S,dr]; valid [B,S] →
    attention output [B, H*dv]."""
    _, rkv, dn, dr, dv = mla_dims(card)
    H = card.n_head
    w_b = lp["wkv_b"].reshape(rkv, H, dn + dv)
    w_uk, w_uv = w_b[..., :dn], w_b[..., dn:]
    scale = 1.0 / ((dn + dr) ** 0.5)

    qc = jnp.einsum("bhd,rhd->bhr", q_nope.astype(jnp.float32),
                    w_uk.astype(jnp.float32))                 # absorb W_uk
    s = jnp.einsum("bhr,bsr->bhs", qc, c_kv.astype(jnp.float32)) \
        + jnp.einsum("bhd,bsd->bhs", q_rope.astype(jnp.float32),
                     k_rope.astype(jnp.float32))
    s = jnp.where(valid[:, None, :], s * scale, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out_c = jnp.einsum("bhs,bsr->bhr", p, c_kv.astype(jnp.float32))
    out = jnp.einsum("bhr,rhd->bhd", out_c, w_uv.astype(jnp.float32))
    return out.reshape(out.shape[0], H * dv).astype(jnp.bfloat16)


def mla_prefill(card: ModelCard, params: Params, tokens: jax.Array,
                cache: MLACache) -> Tuple[jax.Array, MLACache]:
    """Prefill from an empty latent cache. Returns last-position logits."""
    B, T = tokens.shape
    positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_freqs(card.qk_rope_head_dim, card.max_pos,
                          card.rope_theta, card.rope_scaling_dict())
    x = gather_embed(params["wte"], tokens)
    causal = (jnp.arange(T)[None, :, None] >= jnp.arange(T)[None, None, :])
    c_all, kr_all = [], []
    for li, lp in enumerate(params["layers"]):
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        c, kr = _latents(card, lp, h, positions, cos, sin)
        q_nope, q_rope = _queries(card, lp, h, positions, cos, sin)
        # per-position absorbed attention with causal masking (vmapped on T)
        outs = jax.vmap(
            lambda qn, qr, m: _absorbed_attention(
                card, lp, qn, qr, c, kr, m),
            in_axes=(1, 1, 1), out_axes=1)(q_nope, q_rope,
                                           jnp.broadcast_to(causal, (B, T, T)))
        a = _linear_l(outs, lp, "o")
        x = x + a
        h2 = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h2)
        c_all.append(c)
        kr_all.append(kr)
    S = cache.size
    ck = cache.c_kv.at[:, :, :T].set(
        jnp.stack([c.astype(jnp.bfloat16) for c in c_all])[:, :, :S])
    kr = cache.k_rope.at[:, :, :T].set(
        jnp.stack([k.astype(jnp.bfloat16) for k in kr_all])[:, :, :S])
    cache = dataclasses.replace(cache, c_kv=ck, k_rope=kr,
                                pos=cache.pos + T)
    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    return lm_head(card, params, x[:, -1:])[:, 0], cache


def mla_decode_step(card: ModelCard, params: Params, token: jax.Array,
                    cache: MLACache) -> Tuple[jax.Array, MLACache]:
    """One decode step over the latent cache (linear slots, no ring)."""
    B = token.shape[0]
    positions = jnp.minimum(cache.pos, card.max_pos - 1)[:, None]
    cos, sin = rope_freqs(card.qk_rope_head_dim, card.max_pos,
                          card.rope_theta, card.rope_scaling_dict())
    x = gather_embed(params["wte"], token[:, None])
    slots = jnp.minimum(cache.pos, cache.size - 1)
    bidx = jnp.arange(B)
    valid = jnp.arange(cache.size)[None, :] < jnp.minimum(
        cache.pos + 1, cache.size)[:, None]

    ck, kr = cache.c_kv, cache.k_rope
    for li, lp in enumerate(params["layers"]):
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        c1, kr1 = _latents(card, lp, h, positions, cos, sin)
        ck = ck.at[li].set(ck[li].at[bidx, slots].set(
            c1[:, 0].astype(jnp.bfloat16)))
        kr = kr.at[li].set(kr[li].at[bidx, slots].set(
            kr1[:, 0].astype(jnp.bfloat16)))
        q_nope, q_rope = _queries(card, lp, h, positions, cos, sin)
        a = _absorbed_attention(card, lp, q_nope[:, 0], q_rope[:, 0],
                                ck[li], kr[li], valid)
        x = x + _linear_l(a[:, None], lp, "o")
        h2 = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h2)

    cache = dataclasses.replace(cache, c_kv=ck, k_rope=kr,
                                pos=cache.pos + 1)
    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    return lm_head(card, params, x)[:, 0], cache
