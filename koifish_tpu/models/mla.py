"""Multi-head Latent Attention (DeepSeek-V2/V3 family).

Rebuild of the reference's DeepSeek support (CPU MLA decoder,
src/Transformer/DeepSeek.cpp:76-112 — q/kv low-rank latents, decoupled
RoPE head slice, separate value head dim). This variant up-projects the
latents to per-head K/V once per token and uses the standard cache/
attention machinery (the latent-compressed cache read is a later
optimization; quality and API parity come first).

Layer params (in addition to ln1/ln2/o/mlp):
  wq_a [E, rq], q_norm_a [rq], wq_b [rq, H*(dn+dr)]    (or wq [E, H*(dn+dr)])
  wkv_a [E, rkv + dr], kv_norm_a [rkv]
  wkv_b [rkv, H*(dn + dv)]
  o     [H*dv, E]
where dn = qk_nope_head_dim, dr = qk_rope_head_dim, dv = v_head_dim.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.ops.matmul import qmatmul
from koifish_tpu.ops.norms import rmsnorm
from koifish_tpu.ops.rope import apply_rope, rope_freqs


def mla_dims(card: ModelCard) -> Tuple[int, int, int, int, int]:
    return (card.q_lora_rank, card.kv_lora_rank, card.qk_nope_head_dim,
            card.qk_rope_head_dim, card.v_head_dim)


def init_mla_layer(card: ModelCard, key: jax.Array, dtype=jnp.bfloat16,
                   ) -> Dict[str, Any]:
    E, H = card.n_embd, card.n_head
    rq, rkv, dn, dr, dv = mla_dims(card)
    std = 0.02
    res_std = std / math.sqrt(2 * card.n_layer)
    ks = jax.random.split(key, 5)

    def nrm(k, shape, s=std):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    lp: Dict[str, Any] = {
        "wkv_a": nrm(ks[0], (E, rkv + dr)),
        "kv_norm_a": jnp.ones((rkv,), dtype),
        "wkv_b": nrm(ks[1], (rkv, H * (dn + dv))),
        "o": nrm(ks[2], (H * dv, E), res_std),
    }
    if rq > 0:
        lp["wq_a"] = nrm(ks[3], (E, rq))
        lp["q_norm_a"] = jnp.ones((rq,), dtype)
        lp["wq_b"] = nrm(ks[4], (rq, H * (dn + dr)))
    else:
        lp["wq"] = nrm(ks[3], (E, H * (dn + dr)))
    return lp


def mla_qkv(card: ModelCard, lp: Dict[str, Any], x: jax.Array,
            positions: jax.Array,
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x [B,T,E] -> q,k [B,T,H,dn+dr], v [B,T,H,dv] (RoPE applied to the
    decoupled dr slice; k_rope shared across heads)."""
    B, T, _ = x.shape
    H = card.n_head
    rq, rkv, dn, dr, dv = mla_dims(card)
    eps = card.norm_eps

    if rq > 0:
        qa = rmsnorm(qmatmul(x, lp["wq_a"]), lp["q_norm_a"], eps=eps)
        q = qmatmul(qa, lp["wq_b"])
    else:
        q = qmatmul(x, lp["wq"])
    q = q.reshape(B, T, H, dn + dr)

    kv_a = qmatmul(x, lp["wkv_a"])                      # [B,T,rkv+dr]
    c_kv = rmsnorm(kv_a[..., :rkv], lp["kv_norm_a"], eps=eps)
    k_rope = kv_a[..., rkv:].reshape(B, T, 1, dr)       # shared head

    kv = qmatmul(c_kv, lp["wkv_b"]).reshape(B, T, H, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]

    cos, sin = rope_freqs(dr, card.max_pos, card.rope_theta,
                          card.rope_scaling_dict())
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = apply_rope(q_rope, cos, sin, positions)
    k_rope = apply_rope(k_rope, cos, sin, positions)
    k_rope = jnp.broadcast_to(k_rope, (B, T, H, dr))

    q = jnp.concatenate([q_nope, q_rope], axis=-1)
    k = jnp.concatenate([k_nope, k_rope], axis=-1)
    return q, k, v
