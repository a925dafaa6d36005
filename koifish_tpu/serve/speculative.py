"""Speculative decoding — draft-model lookahead, target-model verify.

Serving capability beyond the reference (its chat loop is strictly
autoregressive, GoPT.cpp:1111): a small draft model proposes ``k``
greedy tokens; the target verifies all of them in ONE prefill-shaped
forward and accepts the longest agreeing prefix plus the target's own
next token — per verify round the target does one (k+1)-token forward
instead of up-to-(k+1) single-token decodes. With greedy decoding the
output is IDENTICAL to plain target-greedy generation (tested), so the
speedup is free of quality change.

TPU-shape discipline: every round runs fixed-shape executables —
draft decode-k scan (1 pending token), a 2-token draft catch-up prefill
(only after fully-accepted rounds), and the target's (k+1)-token verify
prefill. Cache rollback is free: the ring cache masks validity by
``pos``, so rejected slots are simply rewritten by later tokens.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.serve.engine import (_jit_decode_sample_layered_k,
                                      _jit_prefill, _jit_split_cache)
from koifish_tpu.serve.kvcache import KVCache


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
) -> Tuple[jax.Array, dict]:
    """Greedy speculative decoding (B=1). Returns (tokens [1, <=max_new],
    stats). Output matches plain greedy generation of the target."""
    assert prompt.shape[0] == 1, "speculative decoding is single-stream"
    sampler = SamplerCard(temperature=0.0)
    rng = jax.random.PRNGKey(0)

    # prefill both models on the prompt; t0 = first target token
    logits, cache = _jit_prefill(card, params, prompt, cache, fresh=True)
    t0 = int(jnp.argmax(logits[0]))
    _, draft_cache = _jit_prefill(draft_card, draft_params, prompt,
                                  draft_cache, fresh=True)
    dlc = _jit_split_cache(draft_cache, uniform=True)

    seq: List[int] = [t0]
    prompt_len = prompt.shape[1]
    # consumed counts (tokens fed through each model, prompt included)
    c_tgt = prompt_len
    c_drf = prompt_len
    rounds = accepted_total = 0

    while len(seq) < max_new_tokens and seq[-1] != eos_id:
        len_old = len(seq)
        # --- draft: catch up on unconsumed tokens, then propose k ------
        pend_d = seq[c_drf - prompt_len:]          # emitted, not yet fed
        if len(pend_d) == 2:                       # after an all-accept round
            from koifish_tpu.serve.engine import _jit_decode_sample_layered
            tok = jnp.asarray(pend_d[0:1], jnp.int32)
            _, dlc, rng = _jit_decode_sample_layered(
                draft_card, draft_params, tok, dlc, rng, sampler)
            c_drf += 1
            pend_d = pend_d[1:]
        tok = jnp.asarray(pend_d[-1:], jnp.int32)
        toks, dlc, rng = _jit_decode_sample_layered_k(
            draft_card, draft_params, tok, dlc, rng, sampler, k)
        drafts = [int(t[0]) for t in toks]          # d1..dk
        c_drf += k                                  # consumed pend + d1..dk-1

        # --- target: verify [t_last, d1..dk] in one forward ------------
        feed = jnp.asarray([[seq[-1]] + drafts], jnp.int32)   # [1, k+1]
        all_logits, cache = _jit_prefill(card, params, feed, cache,
                                         return_all_logits=True)
        greedy = jnp.argmax(all_logits[0], axis=-1)           # [k+1]
        g = [int(x) for x in greedy]
        c_tgt += k + 1

        a = 0
        while a < k and drafts[a] == g[a] and drafts[a] != eos_id:
            a += 1
        emitted = drafts[:a] + [g[a]]
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
