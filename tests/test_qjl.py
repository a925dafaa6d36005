"""QJL KV-cache quantization (reference Q_JL research mode,
quantizer.cu:844-1050 — here first-class)."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard
from koifish_tpu.dtypes import QFormat
from koifish_tpu.models import init_params
from koifish_tpu.ops.qjl import (qjl_decode_attention, qjl_encode_keys,
                                 qjl_projection, qjl_scores,
                                 qjl_unpack_signs)


def test_qjl_estimator_unbiased():
    """Score estimate tracks <q, k> (sqrt(pi/2)/m sign-sketch estimator)."""
    key = jax.random.PRNGKey(0)
    d, m, n = 64, 512, 256
    proj = qjl_projection(d, m, seed=7)
    k = jax.random.normal(key, (1, 1, n, d))
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, d))
    packed, norms = qjl_encode_keys(k, proj)
    assert packed.shape == (1, 1, n, m // 8)
    est = np.asarray(qjl_scores(q, packed, norms, proj))[0, 0]
    exact = np.asarray(jnp.einsum("d,nd->n", q[0, 0], k[0, 0]))
    corr = np.corrcoef(est, exact)[0, 1]
    assert corr > 0.9, corr
    # magnitude is calibrated, not just correlated
    ratio = np.polyfit(exact, est, 1)[0]
    assert 0.8 < ratio < 1.2, ratio


def test_qjl_signs_roundtrip():
    proj = qjl_projection(32, 64, seed=3)
    k = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    packed, _ = qjl_encode_keys(k, proj)
    signs = qjl_unpack_signs(packed)
    kp = jnp.einsum("...d,dm->...m", k, proj)
    np.testing.assert_array_equal(np.asarray(signs) > 0, np.asarray(kp) >= 0)


def test_qjl_decode_attention_close():
    """QJL decode attention output stays close to exact attention when the
    sketch is large enough."""
    from koifish_tpu.ops.attention import decode_attention
    key = jax.random.PRNGKey(0)
    B, Hq, Hkv, S, D = 2, 4, 2, 64, 64
    m = 2 * D
    proj = qjl_projection(D, m, seed=20260713)
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, S, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, S, D), jnp.bfloat16)
    packed, norms = qjl_encode_keys(k, proj)
    mask = jnp.ones((B, S), bool)
    out = qjl_decode_attention(q, packed, norms, v, mask, proj,
                               1.0 / D ** 0.5)
    ref = decode_attention(q, jnp.moveaxis(k.astype(jnp.bfloat16), 1, 2),
                           jnp.moveaxis(v, 1, 2), mask)
    # sketch noise perturbs the softmax — bounded, not tiny
    err = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())
    assert err < 0.35, err


def test_qjl_cache_end_to_end_decode():
    """QFormat.QJL cache decodes through the engine; output distribution
    stays usable vs the bf16 cache."""
    from koifish_tpu.serve import init_cache
    from koifish_tpu.serve.engine import decode_step, prefill
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 128)

    def run(fmt):
        cache = init_cache(card.n_layer, 2, 32, card.n_kv_head, card.head_dim,
                           fmt=fmt)
        logits, cache = prefill(card, params, toks[:, :-1], cache, fresh=True)
        out, cache = decode_step(card, params, toks[:, -1], cache)
        return out

    ref = run(QFormat.BF16)
    qjl = run(QFormat.QJL)
    pf = jax.nn.softmax(ref, -1)
    pq = jax.nn.softmax(qjl, -1)
    # head_dim 16 -> sketch 32: noisy but the distribution must stay close
    assert float(jnp.abs(pf - pq).max()) < 0.4


def test_qjl_generate_layered_path():
    """generate() (per-layer cache path) must handle the QJL format —
    regression guard: the layered rewrite initially only knew
    INT8/INT4/BF16."""
    from koifish_tpu.config import SamplerCard
    from koifish_tpu.serve import generate, init_cache
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 128)

    def run(fmt):
        cache = init_cache(card.n_layer, 2, 32, card.n_kv_head,
                           card.head_dim, fmt=fmt)
        toks, _ = generate(card, params, prompt, cache,
                           SamplerCard(temperature=0.0), max_new_tokens=6,
                           decode_chunk=3)
        return np.asarray(toks)

    ref = run(QFormat.BF16)
    qjl = run(QFormat.QJL)
    assert qjl.shape == ref.shape
    # greedy tokens from a sketched cache mostly agree on a tiny model
    assert (qjl == ref).mean() > 0.5
