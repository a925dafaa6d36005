"""Continuous batching — multi-request decode with slot-based KV cache.

New capability vs the reference (its chat loop is single-stream,
GoPT.cpp:1111); designed for XLA static shapes (SURVEY.md §7 hard-part
#4):

- a fixed pool of B decode slots shares one [L, B, S, H, D] cache; slots
  are admitted/freed as requests arrive/finish — the decode step shape
  never changes, so exactly one compiled executable serves the loop
- prefill runs per-request on bucketed (next-pow2) prompt lengths to
  bound recompiles, into a single-lane cache merged into the pool slot
- per-slot position counters (the cache already tracks pos per lane)

Reports TTFT and decode tokens/s per request (the BASELINE.json serving
metrics).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.dtypes import QFormat
from koifish_tpu.ops.sampling import sample_logits
from koifish_tpu.serve import kvcache as kvc
from koifish_tpu.serve.engine import (jit_decode_sample_layered,
    jit_decode_sample_layered_k, jit_prefill)
from koifish_tpu.serve.kvcache import KVCache, init_cache
from koifish_tpu.serve.layered import LayeredKVCache, split_cache


@dataclasses.dataclass
class Request:
    rid: int
    prompt: List[int]
    max_new: int = 64
    eos_id: int = -1
    # filled by the engine:
    tokens: List[int] = dataclasses.field(default_factory=list)
    ttft_s: Optional[float] = None
    ttft_cold: bool = False   # True if TTFT includes XLA compile (bucket not warm)
    decode_s: float = 0.0     # approximate (shared batch wall time, prorated)
    done: bool = False

    @property
    def tokens_per_sec(self) -> float:
        n = max(len(self.tokens) - 1, 0)
        return n / self.decode_s if self.decode_s > 0 else 0.0


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def merge_lane(pool: LayeredKVCache, lane: KVCache, slot: int,
               ) -> LayeredKVCache:
    """Copy a 1-lane [L,1,...] cache into pool slot ``slot`` (admission).
    ``slot`` is a host int, so each per-layer write is one static-index
    dynamic_update_slice — no scatter, in place on the dead pool leaf."""
    def put(dst, src):
        if dst is None:
            return None
        return tuple(d.at[slot].set(src[l, 0]) for l, d in enumerate(dst))
    return dataclasses.replace(
        pool,
        k=put(pool.k, lane.k), v=put(pool.v, lane.v),
        k_scale=put(pool.k_scale, lane.k_scale),
        v_scale=put(pool.v_scale, lane.v_scale),
        pos=pool.pos.at[slot].set(lane.pos[0]))


class ContinuousBatcher:
    """Admit → prefill → batched decode → complete, under one static shape."""

    def __init__(self, card: ModelCard, params, n_slots: int = 8,
                 cache_size: int = 1024, kv_fmt: QFormat = QFormat.BF16,
                 sampler: Optional[SamplerCard] = None,
                 rng: Optional[jax.Array] = None,
                 decode_params=None, decode_chunk: int = 1):
        self.card, self.params = card, params
        self.decode_params = decode_params if decode_params is not None \
            else params
        # tokens generated per host round-trip (eos checked every chunk)
        self.decode_chunk = max(1, decode_chunk)
        self.n_slots = n_slots
        self.cache_size = cache_size
        self.kv_fmt = kv_fmt
        self.sampler = sampler or SamplerCard()
        self.rng = rng if rng is not None else jax.random.PRNGKey(self.sampler.seed)
        # per-layer leaves + per-lane slots (uniform=False masked writes);
        # born layered — the [L, ...] stacked pool never exists
        # (init transient capped at one layer, layered.init_layered_cache)
        from koifish_tpu.serve.layered import init_layered_cache
        self.pool = init_layered_cache(
            card.n_layer, n_slots, cache_size, card.n_kv_head,
            card.head_dim, fmt=kv_fmt, uniform=False)
        self.slots: List[Optional[Request]] = [None] * n_slots
        self.waiting: List[Request] = []
        self.cur_tok = jnp.zeros((n_slots,), jnp.int32)
        self.results: Dict[int, Request] = {}
        self._warm_buckets: set = set()      # prefill bucket lengths compiled
        # exact aggregate serving metrics (per-request decode_s is prorated
        # batch wall time — fine relatively; publish these instead)
        self.decode_wall_s = 0.0
        self.decoded_tokens = 0

    @property
    def aggregate_tokens_per_sec(self) -> float:
        """Exact: total decoded tokens / total decode wall time."""
        return self.decoded_tokens / self.decode_wall_s \
            if self.decode_wall_s > 0 else 0.0

    def warmup(self, max_prompt_len: int = 0) -> None:
        """Pre-compile the prefill executables for every bucket up to
        ``max_prompt_len`` (default: longest waiting prompt) plus one decode
        step, so reported TTFTs are warm numbers (VERDICT r1 weak #6)."""
        if max_prompt_len <= 0:
            max_prompt_len = max((len(r.prompt) for r in self.waiting),
                                 default=16)
        b = 16
        while True:
            if b not in self._warm_buckets:
                lane = init_cache(self.card.n_layer, 1, self.cache_size,
                                  self.card.n_kv_head, self.card.head_dim,
                                  fmt=self.kv_fmt)
                logits, _ = jit_prefill(
                    self.card, self.params,
                    jnp.zeros((1, b), jnp.int32), lane,
                    return_all_logits=True, fresh=True)
                jax.block_until_ready(logits)
                self._warm_buckets.add(b)
            if b >= max_prompt_len:
                break
            b *= 2
        # decode executable (the single static-shape step). The decode jit
        # donates its cache argument, so warm up on a throwaway copy —
        # otherwise self.pool's buffers would be invalidated here.
        import jax.tree_util as jtu
        pool_copy = jtu.tree_map(lambda a: a + 0, self.pool)
        if self.decode_chunk > 1:
            toks_k, _, _ = jit_decode_sample_layered_k(
                self.card, self.decode_params, self.cur_tok, pool_copy,
                self.rng, self.sampler, self.decode_chunk, streaming=False)
            jax.block_until_ready(toks_k)
        else:
            tok, _, _ = jit_decode_sample_layered(
                self.card, self.decode_params, self.cur_tok, pool_copy,
                self.rng, self.sampler, streaming=False)
            jax.block_until_ready(tok)

    # -- admission ----------------------------------------------------------

    def submit(self, req: Request) -> None:
        self.waiting.append(req)

    def _admit(self) -> None:
        for slot in range(self.n_slots):
            if self.slots[slot] is not None or not self.waiting:
                continue
            req = self.waiting.pop(0)
            t0 = time.perf_counter()
            # bucket the prompt to the next power of two: right-pad with the
            # last token, roll ``pos`` back so padded K/V stay masked, and
            # read logits at the last REAL position. One executable per
            # bucket, not per prompt length (XLA static shapes).
            blen = _bucket(len(req.prompt))
            req.ttft_cold = blen not in self._warm_buckets
            self._warm_buckets.add(blen)
            pad = blen - len(req.prompt)
            ids = req.prompt + [req.prompt[-1]] * pad
            lane = init_cache(self.card.n_layer, 1, self.cache_size,
                              self.card.n_kv_head, self.card.head_dim,
                              fmt=self.kv_fmt)
            all_logits, lane = jit_prefill(
                self.card, self.params, jnp.asarray([ids], jnp.int32), lane,
                return_all_logits=True, fresh=True)
            logits = all_logits[:, len(req.prompt) - 1]
            lane = dataclasses.replace(lane, pos=lane.pos - pad)
            self.pool = merge_lane(self.pool, lane, slot)
            self.rng, sub = jax.random.split(self.rng)
            tok = sample_logits(sub, logits, self.sampler.temperature,
                                self.sampler.top_k, self.sampler.top_p,
                                self.sampler.min_p,
                                getattr(self.sampler, "approx_top_k", False),
                                getattr(self.sampler, "method", "topk"))
            req.ttft_s = time.perf_counter() - t0
            req.tokens.append(int(tok[0]))
            self.cur_tok = self.cur_tok.at[slot].set(tok[0])
            self.slots[slot] = req
            if int(tok[0]) == req.eos_id or req.max_new <= 1:
                self._finish(slot)

    def _finish(self, slot: int) -> None:
        req = self.slots[slot]
        req.done = True
        self.results[req.rid] = req
        self.slots[slot] = None
        # free the lane: zero pos so the mask hides stale KV
        self.pool = dataclasses.replace(
            self.pool, pos=self.pool.pos.at[slot].set(0))

    # -- main loop ----------------------------------------------------------

    def step(self) -> bool:
        """One engine step (admissions + one batched decode). Returns True
        while work remains."""
        self._admit()
        active = [s for s, r in enumerate(self.slots) if r is not None]
        if not active:
            return bool(self.waiting)
        t0 = time.perf_counter()
        # host-side streaming rule (see engine.generate): every lane's pos
        # is known on the host (prompt + emitted tokens), so pre-wrap
        # dispatches use the executable with the sink re-rope compiled out
        max_pos = max(len(self.slots[s].prompt) + len(self.slots[s].tokens)
                      for s in active)
        streaming = max_pos + self.decode_chunk > self.cache_size
        if self.decode_chunk > 1:
            toks_k, self.pool, self.rng = jit_decode_sample_layered_k(
                self.card, self.decode_params, self.cur_tok, self.pool,
                self.rng, self.sampler, self.decode_chunk,
                streaming=streaming)
            steps = toks_k.tolist()                 # [k, B] — one sync
            self.cur_tok = toks_k[-1]
        else:
            tok, self.pool, self.rng = jit_decode_sample_layered(
                self.card, self.decode_params, self.cur_tok, self.pool,
                self.rng, self.sampler, streaming=streaming)
            steps = [tok.tolist()]
            self.cur_tok = tok
        dt = time.perf_counter() - t0
        self.decode_wall_s += dt
        for slot in active:
            req = self.slots[slot]
            req.decode_s += dt / len(steps) * min(
                len(steps), req.max_new - len(req.tokens)) \
                if req.max_new > len(req.tokens) else 0.0
            for row in steps:
                if req.done:
                    break
                req.tokens.append(int(row[slot]))
                self.decoded_tokens += 1
                if int(row[slot]) == req.eos_id or \
                        len(req.tokens) >= req.max_new:
                    self._finish(slot)
        return True

    def run(self) -> Dict[int, Request]:
        while self.step():
            pass
        return self.results
