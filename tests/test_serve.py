"""Decode-path correctness: incremental decode == full forward; ring-buffer
slot mapping; quantized KV; sampling sanity."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.dtypes import QFormat
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.ops.sampling import sample_logits
from koifish_tpu.serve import init_cache, prefill, decode_step, generate
from koifish_tpu.serve.kvcache import ring_slot


def tiny_card(**kw):
    arch = kw.pop("arch", "QWEN3")
    base = dict(vocab_size=256, n_layer=2, n_embd=64, n_head=4, n_kv_head=2,
                head_dim=16, n_ffn=128, n_ctx=32, max_pos=64)
    base.update(kw)
    return ModelCard.from_arch(arch, **base)


def test_ring_slot():
    s = ring_slot(jnp.arange(40), size=16, sinks=2)
    s = np.asarray(s)
    assert (s[:16] == np.arange(16)).all()       # linear until full
    assert (s[16:] >= 2).all() and (s[16:] < 16).all()   # sinks pinned
    assert s[16] == 2 and s[17] == 3             # ring restarts after sinks


def _incremental_logits(card, params, tokens, fmt=QFormat.BF16):
    B, T = tokens.shape
    cache = init_cache(card.n_layer, B, 32, card.n_kv_head, card.head_dim,
                       fmt=fmt)
    logits, cache = prefill(card, params, tokens[:, :1], cache)
    outs = [logits]
    for t in range(1, T):
        logits, cache = decode_step(card, params, tokens[:, t], cache)
        outs.append(logits)
    return jnp.stack(outs, axis=1)               # [B, T, V]


def test_decode_matches_forward():
    """Token-by-token decode must reproduce the parallel forward — the
    analog of the reference's CPU-oracle decode cross-check (DEBUG.T_cpu)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, card.vocab_size)
    full = model_forward(card, params, tokens)
    inc = _incremental_logits(card, params, tokens)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_prefill_matches_forward():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, card.vocab_size)
    cache = init_cache(card.n_layer, 2, 32, card.n_kv_head, card.head_dim)
    logits, cache = prefill(card, params, tokens, cache)
    full = model_forward(card, params, tokens)[:, -1]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                               rtol=2e-2, atol=2e-2)
    assert int(cache.pos[0]) == 10


def test_prefill_then_decode_gpt2():
    card = tiny_card(arch="GPT2", n_kv_head=4)
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, card.vocab_size)
    full = model_forward(card, params, tokens)
    inc = _incremental_logits(card, params, tokens)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_quantized_kv_close():
    """INT8 KV cache tracks the bf16 cache (quantized-KV capability,
    reference research modes KV_JL/AQUA — src/CLI_params.hpp:488-492)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, card.vocab_size)
    ref = _incremental_logits(card, params, tokens, fmt=QFormat.BF16)
    q8 = _incremental_logits(card, params, tokens, fmt=QFormat.INT8)
    pf = jax.nn.softmax(ref, -1)
    pq = jax.nn.softmax(q8, -1)
    assert float(jnp.abs(pf - pq).max()) < 0.05
    # packed INT4 KV (2 codes/byte): looser but still close
    q4 = _incremental_logits(card, params, tokens, fmt=QFormat.INT4)
    p4 = jax.nn.softmax(q4, -1)
    assert float(jnp.abs(pf - p4).max()) < 0.15


def test_ring_wrap_decode_runs():
    """Decode far past the cache size — ring + sinks keep shapes static and
    outputs finite (StreamingLLM semantics)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    cache = init_cache(card.n_layer, 1, 16, card.n_kv_head, card.head_dim)
    logits, cache = prefill(card, params, jnp.zeros((1, 4), jnp.int32), cache)
    for t in range(30):  # wraps the 16-slot ring
        logits, cache = decode_step(card, params,
                                    jnp.full((1,), t % 17, jnp.int32), cache)
    assert bool(jnp.isfinite(logits).all())
    assert int(cache.pos[0]) == 34


def test_generate_api():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    cache = init_cache(card.n_layer, 2, 32, card.n_kv_head, card.head_dim)
    toks, cache = generate(card, params,
                           jnp.ones((2, 4), jnp.int32), cache,
                           SamplerCard(temperature=0.8, top_k=20, seed=0),
                           max_new_tokens=8)
    assert toks.shape == (2, 8)
    # last sampled token is returned but not yet fed through decode
    assert int(cache.pos[0]) == 4 + 7


def test_sampling_greedy_and_topk():
    logits = jnp.array([[0.0, 5.0, 1.0, -2.0]])
    tok = sample_logits(jax.random.PRNGKey(0), logits, temperature=0.0)
    assert int(tok[0]) == 1
    # top_k=1 == greedy regardless of temperature
    tok = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0, top_k=1)
    assert int(tok[0]) == 1
    # top_p tiny == greedy
    tok = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0,
                        top_k=4, top_p=1e-6)
    assert int(tok[0]) == 1


def test_stacked_decode_matches_unrolled():
    """Layer-scan decode == unrolled decode (bf16 and int8 KV)."""
    from koifish_tpu.serve.stacked import stack_layers, decode_step_stacked
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    sparams = stack_layers(params)
    assert sparams is not None
    for fmt in (QFormat.BF16, QFormat.INT8):
        c1 = init_cache(card.n_layer, 2, 32, card.n_kv_head, card.head_dim,
                        fmt=fmt)
        c2 = init_cache(card.n_layer, 2, 32, card.n_kv_head, card.head_dim,
                        fmt=fmt)
        l1, c1 = prefill(card, params, jnp.ones((2, 4), jnp.int32), c1)
        l2, c2 = prefill(card, params, jnp.ones((2, 4), jnp.int32), c2)
        for t in range(3):
            tok = jnp.full((2,), 5 + t, jnp.int32)
            l1, c1 = decode_step(card, params, tok, c1)
            l2, c2 = decode_step_stacked(card, sparams, tok, c2)
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=2e-2, atol=2e-2), fmt


def test_stack_layers_heterogeneous_returns_none():
    from koifish_tpu.serve.stacked import stack_layers
    from koifish_tpu.config import QuantCard
    from koifish_tpu.quant.apply import quantize_params
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    qc = QuantCard.from_json({"layers.1.self_attn": {"bits": 4},
                              "group_size": 16})
    qp = quantize_params(params, qc)
    assert stack_layers(qp) is None


def test_generate_chunked_matches_per_token():
    """decode_chunk > 1 must produce the same tokens as per-token decode
    (greedy — sampler rng folding is identical either way)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    s = SamplerCard(temperature=0.0)
    c1 = init_cache(card.n_layer, 1, 32, card.n_kv_head, card.head_dim)
    t1, _ = generate(card, params, prompt, c1, s, max_new_tokens=9)
    c2 = init_cache(card.n_layer, 1, 32, card.n_kv_head, card.head_dim)
    t2, _ = generate(card, params, prompt, c2, s, max_new_tokens=9,
                     decode_chunk=4)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_moe_decode_matches_forward():
    """MoE layers (router in lp) flow through every decode path."""
    card = ModelCard.from_arch(
        "QWEN3_MOE", vocab_size=256, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=2, head_dim=16, n_ffn=128, n_ctx=32, max_pos=64,
        n_experts=4, n_experts_active=2, moe_ffn=64)
    params = init_params(card, jax.random.PRNGKey(0))
    toks = jnp.asarray([[7, 3, 11, 19, 2]], jnp.int32)
    ref = model_forward(card, params, toks)

    cache = init_cache(card.n_layer, 1, 32, card.n_kv_head, card.head_dim)
    logits, cache = prefill(card, params, toks[:, :4], cache)
    logits2, cache = decode_step(card, params, toks[:, 4], cache)
    np.testing.assert_allclose(np.asarray(logits2, np.float32),
                               np.asarray(ref[:, -1], np.float32),
                               rtol=2e-2, atol=2e-2)

    from koifish_tpu.serve.layered import decode_step_layered, split_cache
    cache2 = init_cache(card.n_layer, 1, 32, card.n_kv_head, card.head_dim)
    _, cache2 = prefill(card, params, toks[:, :4], cache2)
    lc = split_cache(cache2, uniform=True)
    logits3, _ = decode_step_layered(card, params, toks[:, 4], lc)
    np.testing.assert_allclose(np.asarray(logits3, np.float32),
                               np.asarray(ref[:, -1], np.float32),
                               rtol=2e-2, atol=2e-2)


def test_metropolis_sampling_matches_full_softmax():
    """GOPT_Metropolis (GoPT.cpp:516) live path: CDF sampling over the
    full softmax of the raw logits — no temperature/top-k/top-p. The
    empirical distribution over many draws must track softmax(logits),
    including mass on tokens a top-k sampler would exclude."""
    import numpy as np
    from koifish_tpu.ops.sampling import filtered_probs, sample_logits
    logits = jnp.array([[2.0, 1.0, 0.0, -1.0, -2.0]], jnp.float32)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    toks = jax.vmap(
        lambda k: sample_logits(k, logits, 0.0, 2, 0.5,
                                method="metropolis")[0])(keys)
    counts = np.bincount(np.asarray(toks), minlength=5) / 4096
    np.testing.assert_allclose(counts, probs, atol=0.03)
    # the last token would be cut by top_k=2 — metropolis keeps it
    assert counts[4] > 0.0
    # dense distribution (speculative path) agrees
    q = np.asarray(filtered_probs(logits, 0.0, 2, 0.5,
                                  method="metropolis"))[0]
    np.testing.assert_allclose(q, probs, atol=1e-6)


def test_sampler_method_config():
    from koifish_tpu.config import CLIParams, SamplerCard
    assert SamplerCard().method == "topk"
    p = CLIParams.from_json(
        {"model": {"arch": "GPT2"},
         "chat_sampler": {"method": "Metropolis", "temperature": 0.9}})
    assert p.sampler.method == "metropolis"
    assert p.sampler.temperature == 0.9


@pytest.mark.parametrize("fmt", [QFormat.BF16, QFormat.INT8, QFormat.INT4])
def test_layered_born_cache_generate_parity(fmt):
    """cache_for(layered=True): the cache is BORN per-layer — prefill
    fills it directly (kvcache.write_prefill tuple path) and generate
    never converts. Greedy tokens must match the stacked-cache path
    EXACTLY for every KV format; the returned cache keeps the layered
    type and the positions agree."""
    from koifish_tpu.serve import cache_for, generate
    from koifish_tpu.serve.layered import LayeredKVCache, join_cache

    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0,
                                card.vocab_size, dtype=jnp.int32)
    sampler = SamplerCard(temperature=0.0)

    c_st = cache_for(card, 2, 32, fmt=fmt)
    t_st, c_st = generate(card, params, prompt, c_st, sampler,
                          max_new_tokens=10)
    c_ly = cache_for(card, 2, 32, fmt=fmt, layered=True)
    assert isinstance(c_ly, LayeredKVCache)
    t_ly, c_ly = generate(card, params, prompt, c_ly, sampler,
                          max_new_tokens=10)
    assert t_st.tolist() == t_ly.tolist()
    assert isinstance(c_ly, LayeredKVCache)
    joined = join_cache(c_ly)
    assert joined.pos.tolist() == c_st.pos.tolist()
    np.testing.assert_array_equal(
        np.asarray(joined.k, np.float32), np.asarray(c_st.k, np.float32))
