"""Paged KV cache — vLLM-style block tables, TPU-native.

The slot-pool serving cache (serve/batching.py) preallocates a full
``cache_size`` window per lane; long-tailed request mixes waste most of
it. Pages fix that: K/V live in a shared pool of fixed-size pages
(``[Hkv, n_pages, PAGE, D]`` per layer), each sequence owns a page TABLE
(``[B, max_pages]`` int32), and pool capacity tracks the number of
tokens actually resident, not B x max_len. Capacity grows by doubling
(one recompile per doubling — log2(max_len/PAGE) compiles total).

Reads go through ``jax.experimental.pallas.ops.tpu.paged_attention``
(the public TPU paged-attention kernel) on TPU and an XLA gather oracle
elsewhere. Writes reuse the block-local masked-select pattern of
ops/pallas/slotwrite.py: one page per lane is DMA'd, the row
``pos % PAGE`` is overwritten, nothing else is touched.

The reference has no analog (its KV cache is a single ring buffer,
Pipe.hpp:160); this is part of the serving layer the rebuild adds
(SURVEY §7 layer 4).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.models.transformer import (
    Params, _linear_l, _norm, gather_embed, lm_head, mlp, qkv_project)
from koifish_tpu.ops.attention import decode_attention

PAGE = 128          # positions per page


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Per-layer page pools + one page table shared by all layers
    (every layer writes the same (lane, position) structure)."""
    k_pages: Tuple[jax.Array, ...]        # L x [Hkv, NP, PAGE, D] bf16
    v_pages: Tuple[jax.Array, ...]
    page_table: jax.Array                 # [B, MAXP] int32 (pool page ids)
    pos: jax.Array                        # [B] int32

    @property
    def n_layers(self) -> int:
        return len(self.k_pages)

    @property
    def n_pages(self) -> int:
        return self.k_pages[0].shape[1]

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]


class PageAllocator:
    """Host-side free-list. Grows the device pools by doubling when the
    free list runs dry; assigns page ids into the table as lanes grow."""

    def __init__(self, cache: PagedKVCache, used: int):
        self.used = used                      # pages handed out so far

    def ensure(self, cache: PagedKVCache, new_pos: int) -> PagedKVCache:
        """Make every lane's table cover positions [0, new_pos). Uniform
        batches: all lanes share new_pos. Returns a (possibly regrown)
        cache; device copies happen only on pool growth."""
        B = cache.page_table.shape[0]
        need_pages = -(-new_pos // PAGE)          # per lane
        have_pages = self.used // B
        if need_pages <= have_pages:
            return cache
        assert need_pages <= cache.max_pages, (
            f"sequence needs {need_pages} pages > table capacity "
            f"{cache.max_pages}")
        # grow the pool (double until it fits)
        total_needed = need_pages * B
        np_ = cache.n_pages
        while np_ < total_needed:
            np_ *= 2
        if np_ != cache.n_pages:
            grow = lambda p: jnp.concatenate(
                [p, jnp.zeros((p.shape[0], np_ - p.shape[1]) + p.shape[2:],
                              p.dtype)], axis=1)
            cache = dataclasses.replace(
                cache, k_pages=tuple(grow(p) for p in cache.k_pages),
                v_pages=tuple(grow(p) for p in cache.v_pages))
        # hand out ids: lane-major so a lane's pages stay contiguous-ish
        table = cache.page_table
        for p in range(have_pages, need_pages):
            ids = self.used + jnp.arange(B, dtype=jnp.int32)
            table = table.at[:, p].set(ids)
            self.used += B
        return dataclasses.replace(cache, page_table=table)


def init_paged_cache(n_layers: int, batch: int, n_kv_heads: int,
                     head_dim: int, initial_pages: Optional[int] = None,
                     max_pages: int = 64) -> Tuple[PagedKVCache,
                                                   PageAllocator]:
    """Pool starts at ``initial_pages`` (default: one page per lane) and
    grows on demand — KV memory tracks resident tokens, not B x max_len."""
    np_ = initial_pages or batch
    mk = lambda: tuple(
        jnp.zeros((n_kv_heads, np_, PAGE, head_dim), jnp.bfloat16)
        for _ in range(n_layers))
    cache = PagedKVCache(k_pages=mk(), v_pages=mk(),
                         page_table=jnp.zeros((batch, max_pages), jnp.int32),
                         pos=jnp.zeros((batch,), jnp.int32))
    return cache, PageAllocator(cache, used=0)


# --- write path ------------------------------------------------------------

def _page_write_ref(pages: jax.Array, val: jax.Array, page_ids: jax.Array,
                    rows: jax.Array) -> jax.Array:
    """XLA fallback: pages [H, NP, P, D] <- val [B, H, D] at
    (page_ids[b], rows[b]). Masked select over the pool (test oracle /
    CPU path; the Pallas writer below touches one page per lane)."""
    NP, P = pages.shape[1], pages.shape[2]
    # [B, NP, P] one-hot of the (page, row) target per lane
    hit = ((jnp.arange(NP)[None, :, None] == page_ids[:, None, None])
           & (jnp.arange(P)[None, None, :] == rows[:, None, None]))
    # scatter-free: for each (page, row), pick the writing lane (unique
    # by construction — each lane owns its pages)
    contrib = jnp.einsum("bnp,bhd->hnpd", hit.astype(val.dtype),
                         val.astype(jnp.float32).astype(val.dtype))
    any_hit = hit.any(axis=0)[None, :, :, None]
    return jnp.where(any_hit, contrib.astype(pages.dtype), pages)


def _page_write(pages: jax.Array, val: jax.Array, page_ids: jax.Array,
                rows: jax.Array) -> jax.Array:
    """Dispatch: Pallas block-local writer on TPU, XLA oracle elsewhere."""
    from koifish_tpu.ops.pallas.slotwrite import page_write_or_none
    out = page_write_or_none(pages, val, page_ids, rows)
    return out if out is not None else _page_write_ref(pages, val,
                                                       page_ids, rows)


# --- read path ---------------------------------------------------------------

def _paged_attention_ref(q, k_pages, v_pages, lengths, page_indices,
                         scale) -> jax.Array:
    """XLA oracle: gather each lane's pages into a dense [B, S, H, D]
    view, run the masked decode attention."""
    B, maxp = page_indices.shape
    # take along the page axis: [H, NP, P, D] x [B, maxp] -> [H, B, maxp,
    # P, D]; batch to front then flatten (maxp, P) -> S. (A previous
    # moveaxis(2, 0) scrambled batch/page axes — the reshape still
    # "worked" on sizes, so only the on-chip smoke against the TPU
    # kernel caught it.)
    gk = jnp.moveaxis(jnp.take(k_pages, page_indices, axis=1), 1, 0)
    gv = jnp.moveaxis(jnp.take(v_pages, page_indices, axis=1), 1, 0)
    S = maxp * PAGE
    gk = gk.reshape(B, k_pages.shape[0], S, k_pages.shape[-1])
    gv = gv.reshape(B, v_pages.shape[0], S, v_pages.shape[-1])
    valid = jnp.arange(S)[None, :] < lengths[:, None]
    return decode_attention(q, jnp.moveaxis(gk, 1, 2),
                            jnp.moveaxis(gv, 1, 2), valid, scale=scale)


def _paged_attention(q, k_pages, v_pages, lengths, page_indices, scale):
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu and page_indices.shape[1] % 4 == 0:
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as tpu_paged_attention)
        out = tpu_paged_attention(
            (q * scale).astype(q.dtype), k_pages, v_pages, lengths,
            page_indices, pages_per_compute_block=4)
        return out.astype(jnp.bfloat16)
    return _paged_attention_ref(q, k_pages, v_pages, lengths, page_indices,
                                scale)


# --- decode step -------------------------------------------------------------

def decode_step_paged(card: ModelCard, params: Params, token: jax.Array,
                      cache: PagedKVCache) -> Tuple[jax.Array, PagedKVCache]:
    """One decode step over the paged cache: token [B] -> logits [B, V].
    Uniform positions (plain generate); the allocator guarantees the
    table covers pos before dispatch."""
    from koifish_tpu.serve.engine import _decode_rope
    B = token.shape[0]
    positions = cache.pos[:, None]
    cos, sin, _ = _decode_rope(card, positions)
    x = gather_embed(params["wte"], token[:, None])
    if card.pos_embed == "learned":
        wpe_pos = jnp.minimum(positions[:, 0], card.max_pos - 1)
        x = x + jnp.take(params["wpe"], wpe_pos, axis=0)[:, None]

    page_ids = jnp.take_along_axis(cache.page_table,
                                   (cache.pos // PAGE)[:, None],
                                   axis=1)[:, 0]              # [B]
    rows = cache.pos % PAGE
    lengths = cache.pos + 1
    att_scale = 1.0 / (card.head_dim ** 0.5)

    layers = params["layers"]
    if not isinstance(layers, list):
        layers = [jax.tree_util.tree_map(lambda a: a[li], layers)
                  for li in range(card.n_layer)]
    k_out: List[jax.Array] = []
    v_out: List[jax.Array] = []
    for li, lp in enumerate(layers):
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        q, k, v = qkv_project(card, lp, h, cos, sin, None)
        kp = _page_write(cache.k_pages[li], k[:, 0].astype(jnp.bfloat16),
                         page_ids, rows)
        vp = _page_write(cache.v_pages[li], v[:, 0].astype(jnp.bfloat16),
                         page_ids, rows)
        k_out.append(kp)
        v_out.append(vp)
        a = _paged_attention(q[:, 0].astype(jnp.bfloat16), kp, vp, lengths,
                             cache.page_table, att_scale)
        a = _linear_l(a.reshape(B, 1, -1), lp, "o")
        x = x + a
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h)

    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    logits = lm_head(card, params, x, out_dtype=jnp.bfloat16)[:, 0]
    cache = dataclasses.replace(cache, k_pages=tuple(k_out),
                                v_pages=tuple(v_out), pos=cache.pos + 1)
    return logits, cache


@functools.partial(jax.jit, static_argnames=("card", "sampler", "k"),
                   donate_argnames=("cache",))
def _jit_decode_paged_k(card, params, token, cache, rng, sampler, k):
    from koifish_tpu.ops.sampling import sample_logits

    def body(carry, _):
        tok, cache, rng = carry
        logits, cache = decode_step_paged(card, params, tok, cache)
        rng, sub = jax.random.split(rng)
        tok = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                            sampler.top_p, sampler.min_p,
                            getattr(sampler, "approx_top_k", False),
                        getattr(sampler, "method", "topk"))
        return (tok, cache, rng), tok

    (token, cache, rng), toks = jax.lax.scan(body, (token, cache, rng),
                                             None, length=k)
    return toks, cache, rng


def generate_paged(card: ModelCard, params: Params, prompt: jax.Array,
                   sampler=None, max_new_tokens: int = 64,
                   eos_id: int = -1, rng: Optional[jax.Array] = None,
                   decode_chunk: int = 8, max_pages: int = 64,
                   ) -> jax.Array:
    """Paged-cache generation (uniform batch). Prefill feeds the prompt
    token-by-token through the paged decode step (v1 — chunked paged
    prefill is a follow-up); KV memory grows page-by-page instead of
    preallocating B x max_len."""
    from koifish_tpu.config import SamplerCard
    from koifish_tpu.ops.sampling import sample_logits
    sampler = sampler or SamplerCard()
    rng = rng if rng is not None else jax.random.PRNGKey(sampler.seed)
    B, T = prompt.shape
    cache, alloc = init_paged_cache(card.n_layer, B, card.n_kv_head,
                                    card.head_dim, max_pages=max_pages)
    jit_step = jax.jit(decode_step_paged, static_argnames=("card",),
                       donate_argnames=("cache",))
    logits = None
    cache = alloc.ensure(cache, T)
    for t in range(T):                      # prompt feed (uniform)
        logits, cache = jit_step(card, params, prompt[:, t], cache)
    rng, sub = jax.random.split(rng)
    tok = sample_logits(sub, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p, sampler.min_p,
                        getattr(sampler, "approx_top_k", False),
                        getattr(sampler, "method", "topk"))
    out = [tok]
    done = tok == eos_id
    pos = T
    remaining = max_new_tokens - 1
    while remaining > 0 and not bool(done.all()):
        k = min(decode_chunk, remaining)
        cache = alloc.ensure(cache, pos + k + 1)
        toks, cache, rng = _jit_decode_paged_k(card, params, tok, cache,
                                               rng, sampler, k)
        for i in range(k):
            tok = jnp.where(done, eos_id, toks[i])
            done = done | (tok == eos_id)
            out.append(tok)
        pos += k
        remaining -= k
    return jnp.stack(out, axis=1)
