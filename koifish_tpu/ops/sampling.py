"""On-device token sampling: temperature / top-k / top-p / min-p + greedy.

The reference samples on the CPU with a top-k heap after a D2H logits copy
(``LogitsInfo::TopK/TopP``, src/Manifold/GoPT.hpp:86-88, GoPT.cpp:614-900).
TPU-native: sampling stays on device inside the jitted decode step —
``jax.lax.top_k`` hits the hardware sort unit and no [V]-sized host copy
happens per token.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_logits(
    rng: jax.Array,
    logits: jax.Array,        # [B, V] f32/bf16
    temperature: float = 0.6,
    top_k: int = 50,
    top_p: float = 0.95,
    min_p: float = 0.0,
) -> jax.Array:
    """Returns sampled token ids [B]. temperature<=0 → greedy."""
    lf = logits.astype(jnp.float32)
    if temperature <= 0.0:
        return jnp.argmax(lf, axis=-1).astype(jnp.int32)
    lf = lf / temperature

    if top_k and top_k > 0 and top_k < lf.shape[-1]:
        vals, idx = jax.lax.top_k(lf, top_k)          # [B, K] sorted desc
    else:
        idx = jnp.broadcast_to(jnp.arange(lf.shape[-1])[None], lf.shape)
        vals = jnp.sort(lf, axis=-1)[:, ::-1]
        idx = jnp.take_along_axis(idx, jnp.argsort(lf, axis=-1)[:, ::-1], axis=-1)

    probs = jax.nn.softmax(vals, axis=-1)
    if top_p < 1.0:
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose *previous* cumulative mass < top_p (always >=1 kept)
        keep = (cum - probs) < top_p
        vals = jnp.where(keep, vals, -jnp.inf)
    if min_p > 0.0:
        pmax = probs.max(axis=-1, keepdims=True)
        vals = jnp.where(probs >= min_p * pmax, vals, -jnp.inf)

    choice = jax.random.categorical(rng, vals, axis=-1)   # [B]
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
