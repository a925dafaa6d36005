"""SFT (LoRA/BitFit freezing), fake-quant QAT, gama (scale-only) training,
and Fuyou evolutionary branches."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard, QuantCard, SFTCard, TrainCard
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.quant.apply import quantize_params
from koifish_tpu.quant.qat import ste_fake_quant
from koifish_tpu.dtypes import QFormat
from koifish_tpu.train.fuyou import Fuyou, FuyouConfig
from koifish_tpu.train.lora import add_lora, merge_lora, trainable_mask
from koifish_tpu.train.trainer import (
    TrainState, init_train_state, make_train_step)


def tiny_card():
    return ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)


def pattern_batch(key, b=8, t=32):
    s = jax.random.randint(key, (b, 1), 0, 64)
    return {"tokens": ((s + jnp.arange(t + 1)[None]) % 64)[None].astype(jnp.int32)}


def _train(card, tcard, state, steps, qcard=None, trainable=None):
    step = make_train_step(card, tcard, total_steps=steps, qcard=qcard,
                           trainable=trainable)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(steps):
        key, k = jax.random.split(key)
        state, m = step(state, pattern_batch(k))
        losses.append(float(m["loss"]))
    return state, losses


def test_muon_trains_with_stub_v():
    """Muon: loss drops; Muon-handled 2D-matrix leaves carry size-0
    second-moment stubs (no dead params-sized f32 buffer) while
    AdamW-fallback leaves keep real v buffers."""
    from koifish_tpu.train.optimizer import _muon_leaf, init_opt_state
    card = tiny_card()
    tcard = TrainCard(batch=8, lr=1e-2, warmup=0, optimizer="muon")
    state = init_train_state(card, tcard)
    # structural check: v is a stub exactly on muon leaves (path-aware:
    # embeddings/head stay AdamW and keep real v buffers)
    pl = jax.tree_util.tree_flatten_with_path(state.params)[0]
    v_leaves = jax.tree_util.tree_leaves(state.opt.v)
    assert len(pl) == len(v_leaves)
    n_stub = 0
    for (kp, p), v in zip(pl, v_leaves):
        path = ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        if _muon_leaf(p, "muon", path):
            assert v.size == 0
            n_stub += 1
        elif path.rsplit(".", 1)[-1] == "wte":
            assert v.size == p.size     # embedding stays AdamW
    assert n_stub > 0   # qwen3 tiny model has >=1 muon-eligible matrix
    state, losses = _train(card, tcard, state, 8)
    assert losses[-1] < losses[0]


def test_ste_fake_quant_grads():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64))
    g = jax.grad(lambda w: ste_fake_quant(w, QFormat.INT4).sum())(w)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # straight-through


def test_qat_trains():
    card = tiny_card()
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100)
    qcard = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                                 "group_size": 32})
    state = init_train_state(card, tcard)
    state, losses = _train(card, tcard, state, 20, qcard=qcard)
    assert losses[-1] < losses[0] * 0.6
    # the QAT-trained weights should quantize with low degradation
    qp = quantize_params(state.params, qcard)
    t = pattern_batch(jax.random.PRNGKey(9))["tokens"][0]
    lf = model_forward(card, state.params, t[:, :-1])
    lq = model_forward(card, qp, t[:, :-1])
    pf, pq = jax.nn.softmax(lf, -1), jax.nn.softmax(lq, -1)
    assert float(jnp.abs(pf - pq).max()) < 0.25


def test_gama_training():
    """Scale-only QAT: integer codes frozen, QTensor scales learn."""
    card = tiny_card()
    tcard = TrainCard(batch=8, lr=0.003, warmup=2, dump_every=100, remat=False)
    qcard = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                                 "group_size": 32, "train_target": "gama"})
    params = quantize_params(init_params(card, jax.random.PRNGKey(0)), qcard)
    state = init_train_state(card, tcard, params=params)
    codes_before = np.asarray(params["layers"][0]["q"].codes).copy()
    scales_before = np.asarray(params["layers"][0]["q"].scales).copy()
    state, losses = _train(card, tcard, state, 12, qcard=qcard)
    codes_after = np.asarray(state.params["layers"][0]["q"].codes)
    scales_after = np.asarray(state.params["layers"][0]["q"].scales)
    np.testing.assert_array_equal(codes_before, codes_after)  # frozen
    assert not np.allclose(scales_before, scales_after)       # trained
    assert losses[-1] < losses[0]


def test_lora_training_freezes_base():
    card = tiny_card()
    tcard = TrainCard(batch=8, lr=0.01, warmup=2, dump_every=100)
    sft = SFTCard(method="lora", lora_rank=8)
    params = add_lora(init_params(card, jax.random.PRNGKey(0)), sft,
                      jax.random.PRNGKey(1))
    assert "q_lora" in params["layers"][0]
    mask = trainable_mask(params, "lora")
    tcard.lr = 0.02
    state = init_train_state(card, tcard, params=params)
    base_before = np.asarray(params["layers"][0]["q"]).copy()
    state, losses = _train(card, tcard, state, 30, trainable=mask)
    base_after = np.asarray(state.params["layers"][0]["q"])
    np.testing.assert_array_equal(base_before, base_after)    # frozen
    b = np.asarray(state.params["layers"][0]["q_lora"]["b"], np.float32)
    assert np.abs(b).max() > 0                                # adapters moved
    assert losses[-1] < losses[0] * 0.9
    # merge folds adapters and changes the forward
    merged = merge_lora(state.params)
    assert "q_lora" not in merged["layers"][0]
    t = pattern_batch(jax.random.PRNGKey(5))["tokens"][0]
    l1 = model_forward(card, state.params, t[:, :-1])
    l2 = model_forward(card, merged, t[:, :-1])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=3e-2, atol=3e-2)


def test_bitfit_mask():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    mask = trainable_mask(params, "bitfit")
    assert mask["layers"][0]["ln1"] is True
    assert mask["layers"][0]["q"] is False
    assert mask["ln_f"] is True


def test_fuyou_swarm():
    card = tiny_card()
    tcard = TrainCard(batch=8, lr=0.01, warmup=2, dump_every=100)
    cfg = FuyouConfig(branches=3, switch=5, method="pso_ga", mutation=1e-4)
    state = init_train_state(card, tcard)
    fy = Fuyou(cfg, state.params)
    state = TrainState(params=fy.inject(state.params), opt=state.opt,
                       rng=state.rng)
    step = make_train_step(card, tcard, total_steps=40)
    key = jax.random.PRNGKey(0)
    losses = []
    for it in range(30):
        key, k = jax.random.split(key)
        state, m = step(state, pattern_batch(k))
        losses.append(float(m["loss"]))
        if (it + 1) % cfg.switch == 0:
            key, k = jax.random.split(key)
            recent = float(np.mean(losses[-cfg.switch:]))
            new_params = fy.rotate(state.params, recent, k)
            state = TrainState(params=new_params, opt=state.opt, rng=state.rng)
    assert np.isfinite(fy.scores).sum() >= 3
    assert losses[-1] < losses[0]          # swarm still learns
    assert fy.best in range(cfg.branches)


def test_bitnet_ternary_qat_trains():
    """BITNET arch = ternary fake-quant QAT on every linear (the
    reference's Bitnet subclass trains with T_SIGN ternary weights)."""
    card = ModelCard.from_arch("BITNET", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100)
    qcard = QuantCard.from_json({"self_attn": {"bits": 2}, "mlp": {"bits": 2},
                                 "group_size": 32})
    from koifish_tpu.dtypes import QFormat
    assert qcard.rules[0].fmt == QFormat.TERNARY
    state = init_train_state(card, tcard)
    state, losses = _train(card, tcard, state, 20, qcard=qcard)
    assert losses[-1] < losses[0] * 0.8, losses
    # export: the QAT'd weights survive ternary quantize-at-load
    qp = quantize_params(state.params, qcard)
    assert qp["layers"][0]["q"].fmt == QFormat.TERNARY
    t = pattern_batch(jax.random.PRNGKey(3))["tokens"][0]
    lq = model_forward(card, qp, t[:, :-1])
    assert bool(jnp.isfinite(lq).all())
