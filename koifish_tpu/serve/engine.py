"""Decode engine: batched prefill + jitted single-token decode step.

Rebuilds the reference's generation path (``Fish::Chat`` →
``SelfAttention::cuInfer``/``FFN::cuInfer``, src/Manifold/GoPT.cpp:1111,
src/Device/CUDA/QKV.cu:617) TPU-first:

- prefill is **batched** over the whole prompt in one forward (the
  reference feeds prompt tokens one at a time, GoPT.cpp:1139-1146 — a
  deliberate improvement, SURVEY.md §7 layer 4);
- the decode step is one jitted function (embed→L×block→head→sample) with
  donated cache, so the token loop does no host round-trip for sampling.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.models.transformer import (
    Params, _linear_l, _norm, embed_tokens, gather_embed, lm_head, mlp,
    qkv_project)
from koifish_tpu.ops.attention import causal_attention, decode_attention
from koifish_tpu.ops.rope import rope_freqs
from koifish_tpu.ops.sampling import sample_logits
from koifish_tpu.serve import kvcache as kvc
from koifish_tpu.serve.kvcache import KVCache


def _rope_tables(card: ModelCard):
    if card.pos_embed != "rope":
        return None, None
    return rope_freqs(card.head_dim, card.max_pos, card.rope_theta,
                      card.rope_scaling_dict())


def _decode_rope(card: ModelCard, positions: jax.Array):
    """Decode-path rope: (cos, sin, inv_freq) with cos/sin evaluated
    DIRECTLY at the (unclamped) positions [B, 1] — no table, so angles
    keep advancing past max_pos — plus the raw inv_freq that drives the
    per-step sink re-rope (kvcache.rotate_sink_keys_layer)."""
    if card.pos_embed != "rope":
        return None, None, None
    from koifish_tpu.ops.rope import rope_cos_sin_at, rope_inv_freq
    cos, sin = rope_cos_sin_at(card.head_dim, positions, card.rope_theta,
                               card.rope_scaling_dict())
    inv_freq, _ = rope_inv_freq(card.head_dim, card.rope_theta,
                                card.rope_scaling_dict())
    return cos, sin, inv_freq


def prefill(card: ModelCard, params: Params, tokens: jax.Array,
            cache: KVCache, return_all_logits: bool = False,
            fresh: bool = False,
            ) -> Tuple[jax.Array, KVCache]:
    """Run a [B, T] prompt chunk, filling the cache. Returns last-position
    logits [B, V] (or [B, T, V] with ``return_all_logits`` — used by
    bucketed-prefill continuous batching to read the last *real* position
    of a right-padded prompt). Requires pos + T <= cache.size (no ring
    wrap mid-prefill; the ring only rolls during decode).

    ``fresh`` (static): the cache is empty (pos==0) — attention runs
    in-chunk only (flash-kernel eligible, no masked full-cache read),
    the TTFT fast path. Callers check ``int(cache.pos[0]) == 0``.
    """
    B, T = tokens.shape
    if card.arch == "GUPPY":
        # serving uses the deterministic seed-0 FFN row sample; no-op
        # if the caller already injected (covers BatchEngine and
        # caller-stacked decode_params paths, not just generate())
        from koifish_tpu.models.guppy import inject_rows
        params = inject_rows(card, params, None)
    start = cache.pos[0]                       # uniform-start batch
    if getattr(card, "gau_layers", ()):
        raise NotImplementedError(
            "GAU blocks are train/forward only: serving needs a v-gate "
            "cache (the reference cannot build GAU at all — models/gau.py)")
    if getattr(card, "brown_layers", ()):
        raise NotImplementedError(
            "BROWN layers are train/forward only: the learned attention "
            "is bounded at n_ctx and the reference never serves it "
            "(models/brown.py)")
    positions = start + jnp.arange(T, dtype=jnp.int32)
    positions = jnp.minimum(positions, card.max_pos - 1)
    cos, sin = _rope_tables(card)
    S = cache.size

    x = embed_tokens(card, params, tokens)
    if card.pos_embed == "learned":
        x = x + jnp.take(params["wpe"], positions, axis=0)

    # slot s holds absolute position s in the linear (un-wrapped) region;
    # q token i sits at absolute position start+i ⇒ attend slots s <= start+i
    slot_ids = jnp.arange(S)[None, :]                       # [1, S]
    qpos = (start + jnp.arange(T))[:, None]                 # [T, 1]
    allowed = slot_ids <= qpos                              # [T, S]

    for li, lp in enumerate(params["layers"]):
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        q, k, v = qkv_project(card, lp, h, cos, sin, positions)
        cache = kvc.write_prefill(cache, li, k, v, start)
        if fresh:   # empty cache: attention is purely in-chunk (flash path)
            a = causal_attention(q, k, v, window=card.window)
        else:
            kc, vc, _ = kvc.read_layer(cache, li, extra=T)
            a = causal_attention(q, kc, vc, mask=allowed, causal=False)
        a = _linear_l(a.reshape(B, T, -1), lp, "o")
        x = x + a
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h)

    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    if return_all_logits:
        logits = lm_head(card, params, x)
    else:
        logits = lm_head(card, params, x[:, -1:])[:, 0]
    return logits, kvc.advance(cache, T)


def decode_step(card: ModelCard, params: Params, token: jax.Array,
                cache: KVCache, streaming: bool = True,
                ) -> Tuple[jax.Array, KVCache]:
    """One decode step: token [B] -> logits [B, V], updated cache.

    Accepts either per-layer-list params (unrolled, supports heterogeneous
    quant) or layer-stacked params from serve.stacked.stack_layers (scan —
    O(one layer) op count, the fast path on dispatch-bound runtimes).

    ``streaming`` (static): False compiles out the per-step sink re-rope
    — sound when pos + steps <= cache.size for every dispatched step
    (see layered.decode_step_layered)."""
    if card.arch == "GUPPY":
        from koifish_tpu.models.guppy import inject_rows
        params = inject_rows(card, params, None)
    if not isinstance(params["layers"], list):
        from koifish_tpu.serve.stacked import decode_step_stacked
        return decode_step_stacked(card, params, token, cache, streaming)
    B = token.shape[0]
    # UNCLAMPED positions: rope cos/sin evaluated directly (not a table
    # lookup) so angles keep advancing past max_pos — streaming past the
    # window keeps exact relative distances to the ring-buffer keys, and
    # the sinks are re-roped forward per step (write_token below; the
    # reference's kernel_rotate_sink, operator.cuh:89)
    if card.attn == "mla":
        # MLA ropes inside mla_qkv from table positions — keep the
        # clamped path (streaming past the window: standard attn only)
        positions = jnp.minimum(cache.pos, card.max_pos - 1)[:, None]
        cos, sin = _rope_tables(card)
        inv_freq, rope_pos = None, positions
    else:
        positions = cache.pos[:, None]                         # [B, 1]
        cos, sin, inv_freq = _decode_rope(card, positions)
        rope_pos = None

    x = embed_tokens(card, params, token[:, None])    # [B, 1, E]
    if card.pos_embed == "learned":
        wpe_pos = jnp.minimum(positions[:, 0], card.max_pos - 1)
        x = x + jnp.take(params["wpe"], wpe_pos, axis=0)[:, None]

    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.ops.pallas.decode_attn import decode_attention_int8_or_none
    att_scale = 1.0 / (card.head_dim ** 0.5)
    for li, lp in enumerate(params["layers"]):
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        q, k, v = qkv_project(card, lp, h, cos, sin, rope_pos)
        cache = kvc.write_token(cache, li, k[:, 0], v[:, 0],
                                rope_inv_freq=inv_freq if streaming else None)
        a = None
        if cache.fmt in (QFormat.INT8, QFormat.INT4):
            # fused kernel reads INT8/packed-INT4 codes directly (1/2 or
            # 1/4 the HBM traffic of dequant-then-attend)
            lengths = jnp.minimum(cache.pos + 1, cache.size)
            a = decode_attention_int8_or_none(
                q[:, 0], cache.k[li], cache.v[li], cache.k_scale[li],
                cache.v_scale[li], lengths, att_scale)
        elif cache.fmt is QFormat.QJL:
            from koifish_tpu.ops.qjl import (qjl_decode_attention,
                                             qjl_projection)
            proj = qjl_projection(card.head_dim,
                                  kvc.QJL_SKETCH_RATIO * card.head_dim,
                                  kvc.QJL_SEED)
            vl = (cache.v[li].astype(jnp.float32)
                  * cache.v_scale[li][..., None]).astype(jnp.bfloat16)
            valid = jnp.arange(cache.size)[None, :] < jnp.minimum(
                cache.pos + 1, cache.size)[:, None]
            a = qjl_decode_attention(q[:, 0], cache.k[li],
                                     cache.k_scale[li], vl, valid, proj,
                                     att_scale)
        if a is None:
            kc, vc, valid = kvc.read_layer(cache, li, extra=1)
            a = decode_attention(q[:, 0], kc, vc, valid)
        a = _linear_l(a.reshape(B, 1, -1), lp, "o")
        x = x + a
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h)

    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    logits = lm_head(card, params, x)[:, 0]
    return logits, kvc.advance(cache, 1)


# cache is DONATED: the caller's handle is dead after prefill, and at
# big batches an undonated prefill holds two full caches (input + output)
# — the other half of the B-scaling wall (planner.plan_decode)
jit_prefill = jax.jit(prefill,
                      static_argnames=("card", "return_all_logits", "fresh"),
                      donate_argnames=("cache",))


def prefill_chunked(card: ModelCard, params: Params, tokens: jax.Array,
                    cache: KVCache, chunk: int = 512,
                    ) -> Tuple[jax.Array, KVCache]:
    """Prefill an arbitrarily long prompt in fixed-size chunks (bounded
    VMEM/activation footprint; one compiled executable per chunk size —
    SURVEY.md §7 layer 4 'prefill chunks under XLA static shapes')."""
    B, T = tokens.shape
    logits = None
    for s in range(0, T, chunk):
        piece = tokens[:, s: s + chunk]
        if piece.shape[1] < chunk and s > 0:
            # right-pad the tail chunk to keep the executable shape, then
            # roll back the padded positions
            pad = chunk - piece.shape[1]
            piece = jnp.pad(piece, ((0, 0), (0, pad)), mode="edge")
            all_l, cache = jit_prefill(card, params, piece, cache,
                                        return_all_logits=True)
            logits = all_l[:, piece.shape[1] - pad - 1]
            import dataclasses
            cache = dataclasses.replace(cache, pos=cache.pos - pad)
        else:
            logits, cache = jit_prefill(card, params, piece, cache)
    return logits, cache


@functools.partial(jax.jit, static_argnames=("card", "sampler", "streaming"),
                   donate_argnames=("cache",))
def jit_decode_sample(card, params, token, cache, rng, sampler,
                       streaming=True):
    logits, cache = decode_step(card, params, token, cache, streaming)
    rng, sub = jax.random.split(rng)
    nxt = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p, sampler.min_p,
                        getattr(sampler, 'approx_top_k', False),
                        getattr(sampler, 'method', 'topk'))
    return nxt, cache, rng


@functools.partial(jax.jit, static_argnames=("card", "sampler", "streaming"),
                   donate_argnames=("lc",))
def jit_decode_sample_layered(card, params, token, lc, rng, sampler,
                               streaming=True):
    from koifish_tpu.serve.layered import decode_step_layered
    logits, lc = decode_step_layered(card, params, token, lc, streaming)
    rng, sub = jax.random.split(rng)
    nxt = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p, sampler.min_p,
                        getattr(sampler, 'approx_top_k', False),
                        getattr(sampler, 'method', 'topk'))
    return nxt, lc, rng


@functools.partial(jax.jit,
                   static_argnames=("card", "sampler", "k", "streaming"),
                   donate_argnames=("lc",))
def jit_decode_sample_layered_k(card, params, token, lc, rng, sampler, k,
                                 streaming=True):
    """K layered decode+sample steps per dispatch (lax.scan over tokens;
    per-layer cache leaves are loop carries XLA updates in place)."""
    from koifish_tpu.serve.layered import decode_step_layered

    def body(carry, _):
        tok, lc, rng = carry
        logits, lc = decode_step_layered(card, params, tok, lc, streaming)
        rng, sub = jax.random.split(rng)
        tok = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                            sampler.top_p, sampler.min_p,
                        getattr(sampler, 'approx_top_k', False),
                        getattr(sampler, 'method', 'topk'))
        return (tok, lc, rng), tok

    (token, lc, rng), toks = jax.lax.scan(
        body, (token, lc, rng), None, length=k)
    return toks, lc, rng


@functools.partial(jax.jit,
                   static_argnames=("card", "sampler", "k", "streaming"),
                   donate_argnames=("lc",))
def jit_decode_probs_k(card, params, token, lc, rng, sampler, k,
                        streaming=True):
    """K layered decode steps returning BOTH the sampled tokens and the
    dense filtered distribution each was drawn from — what speculative
    rejection sampling needs (serve/speculative)."""
    from koifish_tpu.ops.sampling import filtered_probs
    from koifish_tpu.serve.layered import decode_step_layered

    def body(carry, _):
        tok, lc, rng = carry
        logits, lc = decode_step_layered(card, params, tok, lc, streaming)
        q = filtered_probs(logits, sampler.temperature, sampler.top_k,
                           sampler.top_p, sampler.min_p,
                        getattr(sampler, 'approx_top_k', False),
                        getattr(sampler, 'method', 'topk'))
        rng, sub = jax.random.split(rng)
        tok = jax.random.categorical(
            sub, jnp.log(jnp.maximum(q, 1e-30)), axis=-1).astype(jnp.int32)
        return (tok, lc, rng), (tok, q)

    (token, lc, rng), (toks, qs) = jax.lax.scan(
        body, (token, lc, rng), None, length=k)
    return toks, qs, lc, rng          # toks [k, B], qs [k, B, V]


def _split_cache_impl(cache, uniform):
    from koifish_tpu.serve.layered import split_cache
    return split_cache(cache, uniform)


jit_split_cache = jax.jit(_split_cache_impl, static_argnames=("uniform",),
                           donate_argnums=(0,))


@functools.partial(jax.jit,
                   static_argnames=("card", "sampler", "k", "streaming"),
                   donate_argnames=("cache",))
def jit_decode_sample_k(card, params, token, cache, rng, sampler, k,
                         streaming=True):
    """K decode+sample steps in one executable (lax.scan) — one host
    round-trip per K tokens instead of per token. On tunneled runtimes the
    per-step host fetch (~30 ms RTT) dominates the 121-tok/s serving agg;
    this is the fix (eos is checked on the host every K tokens)."""
    def body(carry, _):
        tok, cache, rng = carry
        logits, cache = decode_step(card, params, tok, cache, streaming)
        rng, sub = jax.random.split(rng)
        tok = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                            sampler.top_p, sampler.min_p,
                        getattr(sampler, 'approx_top_k', False),
                        getattr(sampler, 'method', 'topk'))
        return (tok, cache, rng), tok

    (token, cache, rng), toks = jax.lax.scan(
        body, (token, cache, rng), None, length=k)
    return toks, cache, rng          # toks [k, B]


def generate(
    card: ModelCard,
    params: Params,
    prompt: jax.Array,                 # [B, T] int32
    cache: KVCache,
    sampler: Optional[SamplerCard] = None,
    max_new_tokens: int = 64,
    eos_id: int = -1,
    rng: Optional[jax.Array] = None,
    decode_params: Optional[Params] = None,
    decode_chunk: int = 1,
) -> Tuple[jax.Array, KVCache]:
    """Host-driven generation loop over the jitted decode step. Returns
    (generated tokens [B, <=max_new], cache). ``decode_params``: optional
    layer-stacked params (serve.stacked) used for the decode steps.
    ``decode_chunk``: decode+sample steps per dispatch (eos is checked on
    the host every chunk — on tunneled runtimes per-token dispatch costs
    a ~30 ms RTT, so chat should run chunk 4-16)."""
    sampler = sampler or SamplerCard()
    rng = rng if rng is not None else jax.random.PRNGKey(sampler.seed)
    if card.arch == "GUPPY" and "guppy_rows" not in params["layers"][0]:
        # serving uses the deterministic seed-0 FFN row sample; inject
        # once so prefill/decode layers see concrete row tensors
        from koifish_tpu.models.guppy import inject_rows
        params = inject_rows(card, params, None)
        if decode_params is None:
            decode_params = params
    dparams = decode_params if decode_params is not None else params

    from koifish_tpu.serve.layered import LayeredKVCache, join_cache
    was_layered = isinstance(cache, LayeredKVCache)
    pos_host = int(cache.pos[0])        # host mirror of the uniform pos
    fresh = bool(pos_host == 0)
    logits, cache = jit_prefill(card, params, prompt, cache, fresh=fresh)
    pos_host += prompt.shape[1]
    rng, sub = jax.random.split(rng)
    tok = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p, sampler.min_p,
                        getattr(sampler, 'approx_top_k', False),
                        getattr(sampler, 'method', 'topk'))
    out = [tok]
    done = tok == eos_id
    if was_layered:
        # cache was born per-layer (cache_for(layered=True)): prefill
        # filled it directly and the token loop uses it as-is — the 2x
        # stacked<->layered conversion transient never exists
        lc = cache
    else:
        # per-layer cache leaves for the token loop (serve/layered.py):
        # the one conversion copy buys in-place slot writes per step
        lc = jit_split_cache(cache, uniform=True)
    remaining = max_new_tokens - 1
    while remaining > 0:
        if bool(done.all()):
            break
        k = min(decode_chunk, remaining)
        # static pre-wrap/post-wrap split: while every step of this
        # dispatch stays below the window, run the executable with the
        # sink re-rope compiled out (no step can need it)
        streaming = pos_host + k > lc.size
        if k > 1:
            toks, lc, rng = jit_decode_sample_layered_k(
                card, dparams, tok, lc, rng, sampler, k,
                streaming=streaming)
            steps = [toks[i] for i in range(k)]
        else:
            tok, lc, rng = jit_decode_sample_layered(
                card, dparams, tok, lc, rng, sampler, streaming=streaming)
            steps = [tok]
        pos_host += k
        for t in steps:
            tok = jnp.where(done, eos_id, t)
            done = done | (tok == eos_id)
            out.append(tok)
        remaining -= k
    # give back the representation the caller handed in
    return jnp.stack(out, axis=1), (lc if was_layered else join_cache(lc))


# Backward-compatible aliases (pre-round-5 names). The jit_* names above
# are the PUBLIC per-executable serving API — the exact functions
# generate()/BatchEngine dispatch, promoted so harnesses (bench.py) can
# measure the surface users call without reaching into internals.
_jit_prefill = jit_prefill
_jit_decode_sample = jit_decode_sample
_jit_decode_sample_layered = jit_decode_sample_layered
_jit_decode_sample_layered_k = jit_decode_sample_layered_k
_jit_decode_probs_k = jit_decode_probs_k
_jit_split_cache = jit_split_cache
_jit_decode_sample_k = jit_decode_sample_k
