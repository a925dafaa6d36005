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
    approx: bool = False,
    method: str = "topk",
) -> jax.Array:
    """Returns sampled token ids [B]. temperature<=0 → greedy.

    ``method``: "topk" (default, the GeneratOnPrompt::Sample pipeline)
    or "metropolis" — the reference's GOPT_Metropolis generator
    (GoPT.cpp:516-590) whose live path is plain CDF sampling over the
    FULL softmax of the raw logits (``Sample_CDF``; no temperature /
    top-k / top-p filtering — the teacher-logit mixing branches are
    dead code behind ``assert(0)``). Kept for config parity.

    The default is EXACT top-k (matching the reference's CPU heap,
    GoPT.hpp:86-88), computed via ``jax.lax.approx_max_k(recall_target=
    1.0)`` — at recall_target 1.0 the TPU PartialReduce keeps enough
    candidates per partition that the result is exact (verified against
    ``lax.top_k`` incl. adversarial all-top-k-adjacent inputs), and it
    is ~20x faster than the sort-based ``lax.top_k`` lowering on a 152k
    vocab (1.8 ms vs 35.6 ms at B=32 on v5e — the naive exact sort cost
    4.3 ms/token of the Qwen3 decode step).

    ``approx``: drop recall to ~0.95 on the top-50 (another ~5%
    faster), which silently changes the sampled distribution; opt in
    per request via SamplerCard.approx_top_k / bubble --approx-topk."""
    if method == "metropolis":
        return jax.random.categorical(
            rng, logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if top_k and top_k > 0 and top_k < logits.shape[-1]:
        # cut at the logits dtype (temperature scaling is monotonic — the
        # top-k set is invariant), upcast only the K survivors: the full
        # [B, V] f32 materialization was ~10% of the decode step
        vals, idx = jax.lax.approx_max_k(         # [B, K] desc
            logits, top_k, recall_target=0.95 if approx else 1.0)
        vals = vals.astype(jnp.float32) / temperature
    else:
        lf = logits.astype(jnp.float32) / temperature
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


def filtered_probs(
    logits: jax.Array,        # [B, V]
    temperature: float = 0.6,
    top_k: int = 50,
    top_p: float = 0.95,
    min_p: float = 0.0,
    approx: bool = False,
    method: str = "topk",
) -> jax.Array:
    """The DENSE [B, V] probability distribution ``sample_logits`` draws
    from (temperature + top-k/top-p/min-p filtering, renormalized).
    Speculative rejection sampling needs q(v)/p(v) for every v — the
    acceptance test and the residual max(0, p - q) (serve/speculative)."""
    B, V = logits.shape
    if method == "metropolis":
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if temperature <= 0.0:
        return jax.nn.one_hot(jnp.argmax(logits, axis=-1), V,
                              dtype=jnp.float32)
    if top_k and 0 < top_k < V:
        vals, idx = jax.lax.approx_max_k(
            logits, top_k, recall_target=0.95 if approx else 1.0)
        vals = vals.astype(jnp.float32) / temperature
    else:
        vals = logits.astype(jnp.float32) / temperature
        idx = jnp.broadcast_to(jnp.arange(V)[None], logits.shape)
    probs = jax.nn.softmax(vals, axis=-1)
    if top_p < 1.0:
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p
        vals = jnp.where(keep, vals, -jnp.inf)
    if min_p > 0.0:
        pmax = probs.max(axis=-1, keepdims=True)
        vals = jnp.where(probs >= min_p * pmax, vals, -jnp.inf)
    probs = jax.nn.softmax(vals, axis=-1)
    dense = jnp.zeros((B, V), jnp.float32)
    return dense.at[jnp.arange(B)[:, None], idx].add(probs)
