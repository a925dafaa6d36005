"""Paged KV cache (serve/paged.py): write-path oracle, allocator growth,
and end-to-end parity with the dense ring-cache engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koifish_tpu.config import ModelCard, SamplerCard
from koifish_tpu.serve.paged import (PAGE, PageAllocator, _page_write_ref,
                                     generate_paged, init_paged_cache)


def _card():
    return ModelCard.from_arch(
        "QWEN3", vocab_size=64, n_layer=2, n_embd=64, n_head=4, n_kv_head=2,
        head_dim=16, n_ffn=128, n_ctx=256, max_pos=1024)


def test_page_write_ref_places_rows():
    H, NP, D, B = 2, 6, 16, 3
    pages = jnp.zeros((H, NP, PAGE, D), jnp.bfloat16)
    val = jnp.arange(B * H * D, dtype=jnp.float32).reshape(B, H, D) + 1
    pids = jnp.asarray([0, 2, 5], jnp.int32)
    rows = jnp.asarray([0, 7, PAGE - 1], jnp.int32)
    out = _page_write_ref(pages, val.astype(jnp.bfloat16), pids, rows)
    out = np.asarray(out, np.float32)
    for b in range(B):
        for h in range(H):
            np.testing.assert_allclose(out[h, int(pids[b]), int(rows[b])],
                                       np.asarray(val)[b, h], rtol=1e-2)
    # everything else untouched
    mask = np.zeros((H, NP, PAGE), bool)
    for b in range(B):
        mask[:, int(pids[b]), int(rows[b])] = True
    assert (out[~mask] == 0).all()


def test_page_write_pallas_interpret_matches_ref():
    from koifish_tpu.ops.pallas import slotwrite as psw
    psw.set_interpret(True)
    try:
        H, NP, D, B = 4, 8, 64, 4
        key = jax.random.PRNGKey(0)
        pages = jax.random.normal(key, (H, NP, PAGE, D), jnp.bfloat16)
        val = jax.random.normal(jax.random.PRNGKey(1), (B, H, D),
                                jnp.bfloat16)
        # CONTRACT: page ids are distinct across lanes (each lane owns
        # its pages — PageAllocator guarantees this). Two lanes sharing
        # a page would race the block writeback.
        pids = jnp.asarray([0, 3, 5, 7], jnp.int32)
        rows = jnp.asarray([5, 0, 9, PAGE - 1], jnp.int32)
        got = psw.page_write_or_none(pages, val, pids, rows)
        assert got is not None
        want = _page_write_ref(pages, val, pids, rows)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        psw.set_interpret(False)


def test_allocator_grows_pool_on_demand():
    cache, alloc = init_paged_cache(2, batch=4, n_kv_heads=2, head_dim=16,
                                    max_pages=16)
    assert cache.n_pages == 4                       # one page per lane
    cache = alloc.ensure(cache, PAGE + 1)           # needs 2 pages per lane
    assert cache.n_pages >= 8
    table = np.asarray(cache.page_table)
    ids = table[:, :2].ravel()
    assert len(set(ids.tolist())) == 8              # all distinct pages
    c2 = alloc.ensure(cache, PAGE + 5)              # covered — no change
    assert c2.n_pages == cache.n_pages


def test_paged_generate_matches_dense_greedy():
    """Greedy paged generation == greedy dense-engine generation on a
    trained-ish tiny model (random weights, deterministic argmax path)."""
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.models import init_params
    from koifish_tpu.serve import generate, init_cache
    card = _card()
    params = init_params(card, jax.random.PRNGKey(3))
    prompt = jnp.asarray([[1, 5, 9, 13, 2, 6], [3, 7, 11, 2, 9, 1]],
                         jnp.int32)
    sampler = SamplerCard(temperature=0.0)
    dense_cache = init_cache(card.n_layer, 2, 256, card.n_kv_head,
                             card.head_dim, fmt=QFormat.BF16)
    want, _ = generate(card, params, prompt, dense_cache, sampler=sampler,
                       max_new_tokens=12, decode_chunk=4)
    got = generate_paged(card, params, prompt, sampler=sampler,
                         max_new_tokens=12, decode_chunk=4, max_pages=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_paged_generate_crosses_page_boundary():
    """Generation that walks across a page boundary stays finite and the
    allocator hands out the second page mid-stream."""
    card = _card()
    from koifish_tpu.models import init_params
    params = init_params(card, jax.random.PRNGKey(0))
    B = 2
    prompt = jnp.tile(jnp.arange(PAGE - 4, dtype=jnp.int32)[None] % 64,
                      (B, 1))
    toks = generate_paged(card, params, prompt,
                          sampler=SamplerCard(temperature=0.0),
                          max_new_tokens=16, decode_chunk=4, max_pages=8)
    a = np.asarray(toks)
    assert a.shape == (B, 16) and ((a >= 0) & (a < 64)).all()


def test_paged_attention_ref_vs_independent_oracle():
    """Regression: the dense-gather reference must match a hand-built
    per-lane page concatenation. (A moveaxis bug here survived the
    self-consistent tests — _paged_attention fell back to this same
    function on CPU — and was only caught by the on-chip smoke against
    the TPU paged kernel.)"""
    import numpy as np
    from koifish_tpu.ops.attention import decode_attention
    from koifish_tpu.serve.paged import PAGE, _paged_attention_ref
    Hkv, NP, D, Bp, maxp = 2, 8, 16, 2, 4
    kp = jax.random.normal(jax.random.PRNGKey(0), (Hkv, NP, PAGE, D),
                           jnp.float32) * 0.5
    vp = jax.random.normal(jax.random.PRNGKey(1), (Hkv, NP, PAGE, D),
                           jnp.float32) * 0.5
    qq = jax.random.normal(jax.random.PRNGKey(2), (Bp, 2 * Hkv, D),
                           jnp.float32)
    tbl = jnp.arange(Bp * maxp, dtype=jnp.int32).reshape(Bp, maxp) % NP
    lens = jnp.asarray([PAGE * 2 + 3, PAGE * 4], jnp.int32)
    scale = 1.0 / D ** 0.5
    ref = _paged_attention_ref(qq, kp, vp, lens, tbl, scale)
    S = maxp * PAGE
    k_dense = np.zeros((Bp, S, Hkv, D), np.float32)
    v_dense = np.zeros((Bp, S, Hkv, D), np.float32)
    for b in range(Bp):
        for pi in range(maxp):
            pg = int(tbl[b, pi])
            k_dense[b, pi * PAGE:(pi + 1) * PAGE] = np.moveaxis(
                np.asarray(kp[:, pg]), 0, 1)
            v_dense[b, pi * PAGE:(pi + 1) * PAGE] = np.moveaxis(
                np.asarray(vp[:, pg]), 0, 1)
    mask = np.arange(S)[None, :] < np.asarray(lens)[:, None]
    gold = decode_attention(qq, jnp.asarray(k_dense), jnp.asarray(v_dense),
                            jnp.asarray(mask), scale=scale)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(gold),
                               rtol=1e-5, atol=1e-5)
