"""Attention ops — training (causal, GQA) and decode (KV-cache reading).

Analogs of the reference's attention stack:
- training fwd/bwd: cuDNN flash-attention graphs (src/Device/CUDA/QKV.cu:130-313)
  → here a Pallas flash-attention kernel on TPU with an XLA reference path;
- decode: attention_qk/softmax/attention_v kernels against a ring-buffer KV
  cache with StreamingLLM sinks (src/Device/CUDA/kernel/operator.cuh:573-709,
  Pipe.hpp:160) → here a masked dense read of the (possibly quantized) cache.

Shapes: q [B, T, Hq, D]; k/v [B, S, Hkv, D]; GQA via head-group reshape —
no materialized repeat (the reshape is free under XLA).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = "auto"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "ref", "pallas")
    _BACKEND = name


def _gqa_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """logits [B, Hkv, G, Tq, Tk] without repeating K."""
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, tq, hkv, g, d)
    return jnp.einsum("bthgd,bshd->bhgts", qg, k,
                      preferred_element_type=jnp.float32)


def causal_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    window: int = 0,
    causal: bool = True,
    backend: Optional[str] = None,
) -> jax.Array:
    """Causal (optionally sliding-window / extra-masked) attention.

    mask: optional [B, Tq, Tk] or [Tq, Tk] boolean mask (True = attend).
    With ``causal=True`` it is ANDed with the end-aligned causal mask;
    pass ``causal=False`` to use the explicit mask alone (prefill against
    a partially-filled cache, where slot order != position order).
    """
    backend = backend or _BACKEND
    b, tq, hq, d = q.shape
    tk = k.shape[1]
    scale = scale if scale is not None else 1.0 / (d ** 0.5)

    from koifish_tpu.ops.tracectx import current_sp
    sp = current_sp()
    if (sp is not None and backend != "ref"
            and mask is None and causal and window == 0 and tq == tk
            and v.shape[-1] == d
            and tq % sp.mesh.shape[sp.axis] == 0):
        # sequence-parallel training: ring attention with T sharded over
        # the sp axis (nested shard_map; grads flow — the fori_loop has a
        # static trip count so reverse-mode converts it to a scan). The
        # SPPolicy is a trace-scoped object pushed by make_train_step.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from koifish_tpu.parallel.ring_attention import ring_attention
        spec = P(None, sp.axis, None, None)
        fn = shard_map(
            lambda q_, k_, v_: ring_attention(q_, k_, v_, sp.axis, scale),
            mesh=sp.mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False)
        return fn(q, k, v).astype(q.dtype)

    if backend != "ref" and mask is None and causal:
        from koifish_tpu.ops.pallas import flash
        out = flash.flash_attention_or_none(q, k, v, scale=scale, window=window)
        if out is not None:
            return out

    logits = _gqa_scores(q, k) * scale          # [B,Hkv,G,Tq,Tk]
    if causal:
        qpos = jnp.arange(tq)[:, None] + (tk - tq)  # align ends
        kpos = jnp.arange(tk)[None, :]
        allowed = kpos <= qpos
        if window > 0:
            allowed &= kpos > qpos - window
    else:
        # bidirectional (diffusion-LM / prefill-reorder); mask may further
        # restrict it, or None = full attention
        allowed = jnp.ones((tq, tk), bool)
    if mask is not None:
        m = mask if mask.ndim == 3 else mask[None]
        allowed = allowed[None] & m
        allowed = allowed[:, None, None]        # [B,1,1,Tq,Tk]
    else:
        allowed = allowed[None, None, None]
    logits = jnp.where(allowed, logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v.astype(jnp.float32))
    # NB: value head dim may differ from qk head dim (MLA)
    return out.reshape(b, tq, hq, v.shape[-1]).astype(q.dtype)


def decode_attention(
    q: jax.Array,              # [B, Hq, D] — one new token per sequence
    k_cache: jax.Array,        # [B, S, Hkv, D] (bf16 or dequantized view)
    v_cache: jax.Array,        # [B, S, Hkv, D]
    kv_mask: jax.Array,        # [B, S] bool — valid cache slots
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-step decode attention over a (ring-buffer) cache.

    RoPE and ring-slot handling live in serve/kvcache.py; here the cache is
    position-agnostic: ``kv_mask`` marks live slots (sinks + rolling window),
    the analog of the reference's kv_pos ring masking (Pipe.hpp:259-266).
    """
    b, hq, d = q.shape
    hkv = k_cache.shape[2]
    g = hq // hkv
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    qg = q.reshape(b, hkv, g, d)
    logits = jnp.einsum("bhgd,bshd->bhgs", qg, k_cache,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kv_mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, v_cache.astype(jnp.float32))
    return out.reshape(b, hq, v_cache.shape[-1]).astype(q.dtype)
