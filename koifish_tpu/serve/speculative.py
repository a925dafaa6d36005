"""Speculative decoding — draft-model lookahead, target-model verify.

Serving capability beyond the reference (its chat loop is strictly
autoregressive, GoPT.cpp:1111): a small draft model proposes ``k``
tokens; the target verifies all of them in ONE prefill-shaped forward.
Acceptance is the Leviathan et al. rejection test — accept ``d_i`` with
probability ``min(1, p_i(d_i)/q_i(d_i))``; on rejection resample from
``norm(max(0, p_i - q_i))``; on full acceptance sample the bonus token
from ``p_k`` — so emitted tokens are distributed EXACTLY as the target
alone would produce (greedy is the special case where p and q are
one-hot; the self-draft test pins byte-identical output).

TPU-shape discipline: every round runs fixed-shape executables — a
draft decode-k scan (1 pending token) that also returns the dense
sampling distribution per step, a 1-step draft catch-up (only after
fully-accepted rounds), and the target's (k+1)-token verify prefill.
Cache rollback is free: the ring cache masks validity by ``pos``, so
rejected slots are simply rewritten by later tokens.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.ops.sampling import filtered_probs
from koifish_tpu.serve.engine import (jit_decode_probs_k,
                                      jit_decode_sample_layered,
                                      jit_prefill, jit_split_cache)
from koifish_tpu.serve.kvcache import KVCache

_jit_filtered_probs = jax.jit(
    filtered_probs,
    static_argnames=("temperature", "top_k", "top_p", "min_p", "approx",
                     "method"))


def _rollback(cache, pos: int):
    return dataclasses.replace(
        cache, pos=jnp.full_like(cache.pos, pos))


def speculative_generate(
    card: ModelCard, params,
    draft_card: ModelCard, draft_params,
    prompt: jax.Array,                     # [1, T] int32
    cache: KVCache,                        # target cache (sized >= T+max_new+k)
    draft_cache: KVCache,
    k: int = 4,
    max_new_tokens: int = 64,
    eos_id: int = -1,
    sampler: Optional[SamplerCard] = None,
    seed: int = 0,
) -> Tuple[jax.Array, dict]:
    """Speculative decoding (B=1). Returns (tokens [1, <=max_new], stats).
    Emitted tokens follow the target's sampling distribution exactly;
    with temperature 0 the output is byte-identical to target greedy."""
    assert prompt.shape[0] == 1, "speculative decoding is single-stream"
    sampler = sampler or SamplerCard(temperature=0.0)
    rng = jax.random.PRNGKey(seed)
    host_rng = np.random.default_rng(seed)

    def _p_dist(logits2d):                  # [N, V] -> filtered probs
        # method must match what the draft side samples with (engine
        # jit_decode_probs_k passes it too) — mixing distributions breaks
        # the Leviathan exact-target guarantee
        return np.asarray(_jit_filtered_probs(
            logits2d, temperature=sampler.temperature, top_k=sampler.top_k,
            top_p=sampler.top_p, min_p=sampler.min_p,
            method=getattr(sampler, "method", "topk")))

    # prefill both models on the prompt; t0 ~ target distribution
    logits, cache = jit_prefill(card, params, prompt, cache, fresh=True)
    p0 = _p_dist(logits)[0]
    t0 = int(host_rng.choice(len(p0), p=p0 / p0.sum()))
    _, draft_cache = jit_prefill(draft_card, draft_params, prompt,
                                  draft_cache, fresh=True)
    dlc = jit_split_cache(draft_cache, uniform=True)

    seq: List[int] = [t0]
    prompt_len = prompt.shape[1]
    c_tgt = prompt_len                     # tokens fed through each model
    c_drf = prompt_len
    rounds = accepted_total = 0

    while len(seq) < max_new_tokens and seq[-1] != eos_id:
        len_old = len(seq)
        # --- draft: catch up on unconsumed tokens, then propose k ------
        pend_d = seq[c_drf - prompt_len:]          # emitted, not yet fed
        if len(pend_d) == 2:                       # after an all-accept round
            tok = jnp.asarray(pend_d[0:1], jnp.int32)
            # streaming=False: both caches are sized to hold the whole
            # prompt + max_new + k (never wrap), so the sink re-rope can
            # be compiled out of every speculative dispatch
            _, dlc, rng = jit_decode_sample_layered(
                draft_card, draft_params, tok, dlc, rng, sampler,
                streaming=False)
            c_drf += 1
            pend_d = pend_d[1:]
        tok = jnp.asarray(pend_d[-1:], jnp.int32)
        toks, qs, dlc, rng = jit_decode_probs_k(
            draft_card, draft_params, tok, dlc, rng, sampler, k,
            streaming=False)
        drafts = [int(t[0]) for t in toks]          # d1..dk
        q = np.asarray(qs)[:, 0]                    # [k, V]
        c_drf += k                                  # consumed pend + d1..dk-1

        # --- target: verify [t_last, d1..dk] in one forward ------------
        feed = jnp.asarray([[seq[-1]] + drafts], jnp.int32)   # [1, k+1]
        all_logits, cache = jit_prefill(card, params, feed, cache,
                                         return_all_logits=True)
        p = _p_dist(all_logits[0])                  # [k+1, V]
        c_tgt += k + 1

        # --- rejection sampling (greedy = one-hot special case) --------
        a = 0
        emitted: List[int] = []
        while a < k:
            d = drafts[a]
            ratio = p[a, d] / max(q[a, d], 1e-30)
            if host_rng.random() < min(1.0, ratio) and p[a, d] > 0:
                emitted.append(d)
                if d == eos_id:
                    break
                a += 1
            else:
                resid = np.maximum(p[a] - q[a], 0.0)
                z = resid.sum()
                dist = resid / z if z > 1e-12 else p[a] / p[a].sum()
                emitted.append(int(host_rng.choice(len(dist), p=dist)))
                break
        else:
            bonus = p[k] / p[k].sum()
            emitted.append(int(host_rng.choice(len(bonus), p=bonus)))
        for t in emitted:
            seq.append(t)
            if t == eos_id or len(seq) >= max_new_tokens:
                break
        rounds += 1
        accepted_total += a

        # --- rollback both models to the accepted prefix ----------------
        c_tgt = prompt_len + len_old + a            # consumed seq + d1..da
        cache = _rollback(cache, c_tgt)
        c_drf_valid = prompt_len + len_old + min(a, k - 1)
        if c_drf > c_drf_valid:
            c_drf = c_drf_valid
            dlc = _rollback(dlc, c_drf)

    stats = {"rounds": rounds,
             "accept_rate": accepted_total / max(rounds * k, 1),
             "tokens": len(seq)}
    return jnp.asarray([seq], jnp.int32), stats
