"""MoE layer: routing correctness, forward/decode/train, EP sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.models.moe import moe_ffn, init_moe_layer
from koifish_tpu.serve import init_cache, prefill, decode_step
from koifish_tpu.train.trainer import init_train_state, make_train_step


def moe_card(**kw):
    base = dict(vocab_size=128, n_layer=2, n_embd=64, n_head=4, n_kv_head=2,
                head_dim=16, n_ffn=128, n_ctx=32, max_pos=64,
                n_experts=8, n_experts_active=2, moe_ffn=96)
    base.update(kw)
    return ModelCard.from_arch("QWEN3_MOE", **base)


def test_moe_ffn_routing_exact():
    """With huge capacity, moe_ffn must equal the dense per-token compute."""
    card = moe_card()
    key = jax.random.PRNGKey(0)
    lp = init_moe_layer(card, key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, card.n_embd),
                          jnp.float32)
    out = moe_ffn(card, lp, x, capacity_factor=8.0)

    # dense oracle
    x2 = x.reshape(-1, card.n_embd)
    logits = x2 @ np.asarray(lp["router"], np.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, card.n_experts_active)
    topv = topv / topv.sum(-1, keepdims=True)
    expect = np.zeros_like(np.asarray(x2))
    eg = np.asarray(lp["egate"], np.float32)
    eu = np.asarray(lp["eup"], np.float32)
    ed = np.asarray(lp["edown"], np.float32)
    for t in range(x2.shape[0]):
        acc = 0
        for s in range(card.n_experts_active):
            e = int(topi[t, s])
            h = jax.nn.silu(np.asarray(x2)[t] @ eg[e]) * (np.asarray(x2)[t] @ eu[e])
            acc = acc + float(topv[t, s]) * (np.asarray(h) @ ed[e])
        expect[t] = acc
    np.testing.assert_allclose(np.asarray(out).reshape(-1, card.n_embd),
                               expect, rtol=5e-2, atol=5e-2)


def test_moe_model_forward_and_decode():
    card = moe_card()
    params = init_params(card, jax.random.PRNGKey(0))
    assert "router" in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)
    logits = model_forward(card, params, tokens)
    assert logits.shape == (2, 10, 128)
    assert bool(jnp.isfinite(logits).all())
    # decode path reuses mlp() → routes through moe
    cache = init_cache(card.n_layer, 2, 32, card.n_kv_head, card.head_dim)
    lg, cache = prefill(card, params, tokens, cache)
    lg2, cache = decode_step(card, params, tokens[:, 0], cache)
    assert bool(jnp.isfinite(lg2).all())


def test_moe_trains():
    card = moe_card()
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8


def test_moe_sharded_forward():
    from koifish_tpu.parallel import make_mesh, shard_params
    card = moe_card()
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128)
    ref = model_forward(card, params, tokens)
    mesh = make_mesh({"dp": 2, "tp": 4})
    sp = shard_params(params, mesh)
    out = jax.jit(lambda p, t: model_forward(card, p, t))(sp, tokens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=3e-2, atol=6e-2)
