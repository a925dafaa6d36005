"""Continuous batching: multi-request correctness vs single-stream
generate, staggered admission, slot reuse, TTFT/throughput accounting."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.models import init_params
from koifish_tpu.serve import generate, init_cache
from koifish_tpu.dtypes import QFormat
from koifish_tpu.serve.batching import ContinuousBatcher, Request, _bucket


def tiny_card():
    return ModelCard.from_arch("QWEN3", vocab_size=256, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=64, max_pos=128)


def test_bucket():
    assert _bucket(5) == 16 and _bucket(16) == 16 and _bucket(17) == 32


def test_batcher_matches_single_stream_greedy():
    """Greedy continuous batching must produce the same tokens as the
    single-stream generate for each request."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    sampler = SamplerCard(temperature=0.0)
    prompts = [[5, 6, 7], [9, 10, 11, 12, 13], [40] * 20]

    singles = []
    for p in prompts:
        cache = init_cache(card.n_layer, 1, 64, card.n_kv_head, card.head_dim)
        toks, _ = generate(card, params, jnp.asarray([p], jnp.int32), cache,
                           sampler, max_new_tokens=8)
        singles.append(toks[0].tolist())

    eng = ContinuousBatcher(card, params, n_slots=2, cache_size=64,
                            sampler=sampler)
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=list(p), max_new=8))
    results = eng.run()
    assert len(results) == 3
    for i in range(3):
        assert results[i].tokens == singles[i], f"request {i}"
        assert results[i].ttft_s is not None and results[i].ttft_s > 0


def test_batcher_more_requests_than_slots():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    eng = ContinuousBatcher(card, params, n_slots=2, cache_size=64,
                            sampler=SamplerCard(temperature=0.5, seed=0))
    for i in range(5):
        eng.submit(Request(rid=i, prompt=[i + 1, i + 2], max_new=5))
    results = eng.run()
    assert sorted(results) == [0, 1, 2, 3, 4]
    for r in results.values():
        assert len(r.tokens) == 5
        assert r.done


def test_batcher_eos_frees_slot():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    # find what greedy emits first, use it as "eos" for request 0
    cache = init_cache(card.n_layer, 1, 64, card.n_kv_head, card.head_dim)
    toks, _ = generate(card, params, jnp.asarray([[5, 6]], jnp.int32), cache,
                       SamplerCard(temperature=0.0), max_new_tokens=3)
    eos = int(toks[0, 1])
    eng = ContinuousBatcher(card, params, n_slots=1, cache_size=64,
                            sampler=SamplerCard(temperature=0.0))
    eng.submit(Request(rid=0, prompt=[5, 6], max_new=10, eos_id=eos))
    eng.submit(Request(rid=1, prompt=[7, 8], max_new=4))
    results = eng.run()
    assert results[0].tokens[-1] == eos
    assert len(results[0].tokens) <= 3
    assert len(results[1].tokens) == 4


def test_batcher_decode_chunk_matches_single():
    """decode_chunk>1 (multi-token host round-trips) produces the same
    greedy tokens as chunk=1."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    prompts = [[5, 6, 7], [9, 10, 11, 12]]
    outs = []
    for chunk in (1, 4):
        eng = ContinuousBatcher(card, params, n_slots=2, cache_size=64,
                                sampler=SamplerCard(temperature=0.0),
                                decode_chunk=chunk)
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=list(p), max_new=9))
        outs.append({k: r.tokens for k, r in eng.run().items()})
    assert outs[0] == outs[1]


def test_batcher_int4_kv_pool():
    """Continuous batcher over a packed INT4-KV pool (capacity mode)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    b = ContinuousBatcher(card, params, n_slots=2, cache_size=64,
                          kv_fmt=QFormat.INT4, decode_chunk=4)
    for rid in range(3):
        b.submit(Request(rid=rid, prompt=[3, 5, 7 + rid], max_new=6))
    res = b.run()
    assert len(res) == 3
    assert all(len(r.tokens) == 6 for r in res.values())
    assert b.aggregate_tokens_per_sec > 0
