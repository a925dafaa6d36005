"""Speculative decoding: greedy output must EXACTLY match plain greedy
target generation (the lossless-ness guarantee), for a self-draft and a
weaker independent draft."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.models import init_params
from koifish_tpu.serve import generate, init_cache
from koifish_tpu.serve.speculative import speculative_generate


def _card(layers=2, seed_dim=64):
    return ModelCard.from_arch(
        "QWEN3", vocab_size=97, n_layer=layers, n_embd=seed_dim, n_head=4,
        n_kv_head=2, head_dim=16, n_ffn=128, n_ctx=64, max_pos=128)


def _greedy_reference(card, params, prompt, n):
    cache = init_cache(card.n_layer, 1, 128, card.n_kv_head, card.head_dim)
    toks, _ = generate(card, params, prompt, cache,
                       SamplerCard(temperature=0.0), max_new_tokens=n)
    return np.asarray(toks)[0]


def _spec(card, params, dcard, dparams, prompt, n, k=4):
    cache = init_cache(card.n_layer, 1, 128, card.n_kv_head, card.head_dim)
    dcache = init_cache(dcard.n_layer, 1, 128, dcard.n_kv_head,
                        dcard.head_dim)
    toks, stats = speculative_generate(card, params, dcard, dparams, prompt,
                                       cache, dcache, k=k, max_new_tokens=n)
    return np.asarray(toks)[0], stats


def test_self_draft_exact_and_full_accept():
    card = _card()
    params = init_params(card, jax.random.PRNGKey(0))
    prompt = jnp.asarray([[5, 11, 23, 42]], jnp.int32)
    ref = _greedy_reference(card, params, prompt, 12)
    out, stats = _spec(card, params, card, params, prompt, 12)
    np.testing.assert_array_equal(out[:len(ref)], ref)
    assert stats["accept_rate"] > 0.9        # draft == target: all accepted


def test_weak_draft_still_exact():
    card = _card()
    params = init_params(card, jax.random.PRNGKey(0))
    dcard = _card(layers=1)
    dparams = init_params(dcard, jax.random.PRNGKey(7))   # unrelated draft
    prompt = jnp.asarray([[5, 11, 23, 42]], jnp.int32)
    ref = _greedy_reference(card, params, prompt, 12)
    out, stats = _spec(card, params, dcard, dparams, prompt, 12, k=3)
    np.testing.assert_array_equal(out[:len(ref)], ref)
    assert stats["rounds"] >= 1


def test_sampled_speculative_matches_target_distribution():
    """temperature > 0: the FIRST emitted token's empirical distribution
    under speculative rejection sampling must match direct target
    sampling (the losslessness property of the rejection scheme)."""
    card = _card()
    params = init_params(card, jax.random.PRNGKey(0))
    dcard = _card(layers=1)
    dparams = init_params(dcard, jax.random.PRNGKey(7))
    prompt = jnp.asarray([[5, 11, 23]], jnp.int32)
    sampler = SamplerCard(temperature=1.0, top_k=8, top_p=1.0)

    # direct target distribution of the first token
    from koifish_tpu.ops.sampling import filtered_probs
    from koifish_tpu.serve.engine import _jit_prefill
    cache = init_cache(card.n_layer, 1, 128, card.n_kv_head, card.head_dim)
    logits, _ = _jit_prefill(card, params, prompt, cache, fresh=True)
    p_direct = np.asarray(filtered_probs(logits, 1.0, 8, 1.0))[0]

    n = 400
    counts = np.zeros(card.vocab_size)
    for s in range(n):
        cache = init_cache(card.n_layer, 1, 128, card.n_kv_head,
                           card.head_dim)
        dcache = init_cache(dcard.n_layer, 1, 128, dcard.n_kv_head,
                            dcard.head_dim)
        toks, _ = speculative_generate(card, params, dcard, dparams, prompt,
                                       cache, dcache, k=2, max_new_tokens=1,
                                       sampler=sampler, seed=s)
        counts[int(np.asarray(toks)[0][0])] += 1
    emp = counts / n
    # total-variation distance small (n=400 → noise floor ~0.05)
    tv = 0.5 * np.abs(emp - p_direct).sum()
    assert tv < 0.12, tv


def test_sampled_speculative_runs_multiround():
    card = _card()
    params = init_params(card, jax.random.PRNGKey(0))
    dcard = _card(layers=1)
    dparams = init_params(dcard, jax.random.PRNGKey(7))
    prompt = jnp.asarray([[5, 11, 23, 42]], jnp.int32)
    cache = init_cache(card.n_layer, 1, 128, card.n_kv_head, card.head_dim)
    dcache = init_cache(dcard.n_layer, 1, 128, dcard.n_kv_head,
                        dcard.head_dim)
    toks, stats = speculative_generate(
        card, params, dcard, dparams, prompt, cache, dcache, k=3,
        max_new_tokens=16, sampler=SamplerCard(temperature=0.8), seed=3)
    assert np.asarray(toks).shape[1] >= 16 - 3
    assert stats["rounds"] >= 2


def test_filtered_probs_matches_sampler():
    """filtered_probs must be the exact distribution sample_logits draws
    from (speculative rejection sampling depends on this identity)."""
    from koifish_tpu.ops.sampling import filtered_probs, sample_logits
    logits = jax.random.normal(jax.random.PRNGKey(0), (1, 64)) * 3
    q = np.asarray(filtered_probs(logits, 0.8, 10, 0.9, approx=False))[0]
    assert abs(q.sum() - 1.0) < 1e-5
    assert (q > 0).sum() <= 10
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    toks = jax.vmap(lambda k: sample_logits(k, logits, 0.8, 10, 0.9,
                                            approx=False))(keys)
    emp = np.bincount(np.asarray(toks)[:, 0], minlength=64) / n
    assert 0.5 * np.abs(emp - q).sum() < 0.04    # total variation


def test_speculative_metropolis_target_dist():
    """The target distribution speculative decoding accepts against must
    honor sampler.method — with metropolis the draft samples the full
    softmax, and a top-k-filtered target would break the exact-target
    guarantee (round-5 review finding)."""
    from koifish_tpu.serve.speculative import _jit_filtered_probs
    logits = jnp.array([[3.0, 1.0, 0.0, -1.0]], jnp.float32)
    p = np.asarray(_jit_filtered_probs(
        logits, temperature=0.6, top_k=2, top_p=0.9, min_p=0.0,
        method="metropolis"))[0]
    np.testing.assert_allclose(
        p, np.asarray(jax.nn.softmax(logits, axis=-1))[0], atol=1e-6)
    assert p[3] > 0.0   # top_k=2 would have zeroed it
