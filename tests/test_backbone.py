"""Backbone-JSON honoring (TGraph::jToGraph / J2Neuron semantics)."""
import json

import pytest

from koifish_tpu.config import ModelCard
from koifish_tpu.models.backbone import (BackboneError, flatten_backbone,
                                         validate_backbone)

STD = {
    "embed_tokens": {"Embedding": []},
    "layer": {"self_attn": {"QKV": []}, "mlp": {"FFN": []},
              "# gattn": {"GAU": []}},
    "norm": {"Normal": []},
    "output": {"CLASIFY": []},
}


def test_flatten_expands_layers_and_skips_comments():
    seq = flatten_backbone(STD, n_layer=3)
    types = [t for _, t in seq]
    assert types == ["EMBED"] + ["QKV", "FFN"] * 3 + ["NORMAL", "CLASIFY"]
    # commented '# gattn' GAU is skipped (reference '#' keys, J2Neuron)
    assert all("GAU" != t for t in types)
    # layer paths are expanded with indices (s2layerinfo naming)
    assert seq[1][0].startswith("layer.0.")
    assert seq[3][0].startswith("layer.1.")


def test_reference_config_backbones_validate():
    for f in ("qwen3/qwen3_sft.json", "gpt2_1558M.json",
              "qwen3/qwen3_596M_q4.json"):
        with open("/root/reference/cases/" + f) as fh:
            j = json.load(fh)
        bb = j["model"]["backbone"]
        n_layer = int(j["model"]["parameter"]["Layer"])
        assert validate_backbone(bb, n_layer) == "decoder"


def test_nonstandard_backbone_errors_loudly():
    gau = {
        "embed_tokens": {"Embedding": []},
        "layer": {"gattn": {"GAU": []}, "mlp": {"FFN": []}},
        "norm": {"Normal": []},
        "output": {"CLASIFY": []},
    }
    with pytest.raises(BackboneError, match="not match a supported layout"):
        validate_backbone(gau, 2)
    with pytest.raises(BackboneError, match="unknown neuron type"):
        validate_backbone({"x": {"Wormhole": []}}, 2)


def test_model_card_from_json_checks_backbone():
    jm = {"arch": "QWEN3", "vocab_size": 128,
          "parameter": {"Layer": 2, "transformer": {
              "Ctx": 32, "Embed": 64, "Head": 4, "KVHead": 2,
              "head_dim": 16, "Ffn": 128}},
          "backbone": STD}
    card = ModelCard.from_json(jm)
    assert card.n_layer == 2
    bad = dict(jm, backbone={
        "embed_tokens": {"Embedding": []},
        "layer": {"a": {"QKV": []}, "b": {"QKV": []}, "mlp": {"FFN": []}},
        "norm": {"Normal": []}, "output": {"CLASIFY": []}})
    with pytest.raises(BackboneError):
        ModelCard.from_json(bad)


def test_star_repeat_expansion():
    bb = {
        "embed_tokens": {"Embedding": []},
        "blk *2": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
        "norm": {"Normal": []},
        "output": {"CLASIFY": []},
    }
    assert validate_backbone(bb, 2) == "decoder"


HYBRID = {
    "embed_tokens": {"Embedding": []},
    "dense_a *1": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
    "sparse_a *1": {"self_attn": {"QKV": []}, "mlp": {"MOE": []}},
    "dense_b *1": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
    "sparse_b *1": {"self_attn": {"QKV": []}, "mlp": {"MOE": []}},
    "norm": {"Normal": []},
    "output": {"CLASIFY": []},
}

HYBRID_JM = {
    "arch": "QWEN3_MOE", "vocab_size": 128,
    "parameter": {"Layer": 4, "num_experts": 4, "num_experts_per_tok": 2,
                  "moe_intermediate_size": 64, "max_pos_embeddings": 64,
                  "transformer": {"Ctx": 32, "Embed": 64, "Head": 4,
                                  "KVHead": 2, "head_dim": 16, "Ffn": 128}},
    "backbone": HYBRID,
}


def test_hybrid_backbone_builds_interleaved_moe():
    """A non-standard J2Neuron arrangement (alternating dense/MoE FFN
    layers, TGraph.cpp:1534-1651) is BUILT, not rejected (r2 errored)."""
    import jax
    from koifish_tpu.config import ModelCard
    from koifish_tpu.models import init_params
    from koifish_tpu.models.backbone import moe_layer_indices

    assert validate_backbone(HYBRID, 4) == "hybrid"
    assert moe_layer_indices(HYBRID, 4) == (1, 3)
    card = ModelCard.from_json(HYBRID_JM)
    assert card.moe_layers == (1, 3)
    params = init_params(card, jax.random.PRNGKey(0))
    kinds = ["moe" if "router" in lp else "dense" for lp in params["layers"]]
    assert kinds == ["dense", "moe", "dense", "moe"]


def test_hybrid_backbone_trains_pinned_loss():
    """The hybrid-backbone model trains; final loss pinned (rel_tol 1e-3,
    the reference's golden mechanism, cases/test_lite.py:17-34)."""
    import jax
    import jax.numpy as jnp
    import math
    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    card = ModelCard.from_json(HYBRID_JM)
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, seed=42)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    loss = None
    for _ in range(12):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        loss = float(m["loss"])
    # re-pinned r5: bf16 stochastic rounding default-on
    assert math.isclose(loss, 1.1840893030166626, rel_tol=1e-3), loss


def test_moe_backbone_without_experts_errors():
    from koifish_tpu.config import ModelCard
    jm = dict(HYBRID_JM, parameter={
        "Layer": 4, "max_pos_embeddings": 64,
        "transformer": HYBRID_JM["parameter"]["transformer"]})
    with pytest.raises(BackboneError):
        ModelCard.from_json(jm)


GAU_JM = {
    "arch": "QWEN3", "vocab_size": 128,
    "parameter": {"Layer": 3, "max_pos_embeddings": 64,
                  "transformer": {"Ctx": 32, "Embed": 64, "Head": 4,
                                  "KVHead": 2, "head_dim": 16, "Ffn": 128}},
    "backbone": {
        "embed_tokens": {"Embedding": []},
        "blk0": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
        "gattn": {"GAU": []},
        "blk2": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
        "norm": {"Normal": []}, "output": {"CLASIFY": []}},
}


def test_gau_backbone_builds_and_trains_pinned():
    """A GAU arrangement BUILDS and trains (the reference's GatedAttention
    scaffold can't even construct — TGraph.cpp:505 asserts; ours is the
    working GAU of arXiv:2202.10447). Final loss pinned rel_tol 1e-3."""
    import math

    import jax
    import jax.numpy as jnp

    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.models import init_params, model_forward
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    card = ModelCard.from_json(GAU_JM)
    assert card.gau_layers == (1,)
    params = init_params(card, jax.random.PRNGKey(0))
    assert "upU" in params["layers"][1] and "q" not in params["layers"][1]
    out = model_forward(card, params, jnp.zeros((1, 8), jnp.int32))
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    tcard = TrainCard(batch=8, lr=0.01, warmup=3, seed=42)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    loss = None
    for _ in range(12):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        loss = float(m["loss"])
    # re-pinned r5: bf16 stochastic rounding default-on
    assert math.isclose(loss, 1.15473473072052, rel_tol=1e-3), loss


def test_gau_serving_errors_loudly():
    import jax
    import jax.numpy as jnp
    import pytest as _pt

    from koifish_tpu.config import ModelCard
    from koifish_tpu.models import init_params
    from koifish_tpu.serve import engine, init_cache

    card = ModelCard.from_json(GAU_JM)
    params = init_params(card, jax.random.PRNGKey(0))
    cache = init_cache(card.n_layer, 1, 16, card.n_kv_head, card.head_dim)
    with _pt.raises(NotImplementedError, match="GAU"):
        engine.prefill(card, params, jnp.zeros((1, 4), jnp.int32), cache)


BROWN_JM = {
    "arch": "QWEN3", "vocab_size": 128,
    "parameter": {"Layer": 3, "max_pos_embeddings": 64,
                  "transformer": {"Ctx": 32, "Embed": 64, "Head": 4,
                                  "KVHead": 4, "head_dim": 16, "Ffn": 128}},
    "backbone": {
        "embed_tokens": {"Embedding": []},
        "blk0": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
        "blk1": {"self_attn": {"BROWN": []}, "mlp": {"FFN": []}},
        "blk2": {"self_attn": {"QKV": []}, "mlp": {"FFN": []}},
        "norm": {"Normal": []}, "output": {"CLASIFY": []}},
}


def test_brown_backbone_builds_and_trains_pinned():
    """A BROWN_attn arrangement (learned fixed attention, the reference's
    TGraph.cpp:400-489) BUILDS and trains. Final loss pinned rel_tol 1e-3."""
    import math

    import jax
    import jax.numpy as jnp

    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.models import init_params, model_forward
    from koifish_tpu.models.backbone import brown_layer_indices
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    assert validate_backbone(BROWN_JM["backbone"], 3) == "hybrid"
    assert brown_layer_indices(BROWN_JM["backbone"], 3) == (1,)
    card = ModelCard.from_json(BROWN_JM)
    assert card.brown_layers == (1,)
    params = init_params(card, jax.random.PRNGKey(0))
    lp = params["layers"][1]
    assert "brown_w" in lp and "q" not in lp and "gate" in lp
    assert lp["brown_w"].shape == (4, 32, 32)
    out = model_forward(card, params, jnp.zeros((1, 8), jnp.int32))
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    tcard = TrainCard(batch=8, lr=0.01, warmup=3, seed=42)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    loss = None
    for _ in range(12):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        loss = float(m["loss"])
    # re-pinned r5: bf16 stochastic rounding default-on
    assert math.isclose(loss, 1.9772953987121582, rel_tol=1e-3), loss


def test_brown_causality():
    """BROWN attention must be causal: logits at position t are invariant
    to tokens after t."""
    import jax
    import jax.numpy as jnp

    from koifish_tpu.config import ModelCard
    from koifish_tpu.models import init_params, model_forward

    card = ModelCard.from_json(BROWN_JM)
    params = init_params(card, jax.random.PRNGKey(1))
    t1 = jnp.arange(16, dtype=jnp.int32)[None] % 64
    t2 = t1.at[:, 10:].set(7)
    o1 = model_forward(card, params, t1)
    o2 = model_forward(card, params, t2)
    assert jnp.allclose(o1[:, :10], o2[:, :10], atol=1e-4)


def test_brown_legacy_attention_type_selector():
    """model_v0.attention.type == "brown" makes every layer BROWN
    (reference gLLM.cpp:79)."""
    from koifish_tpu.config import CLIParams

    raw = {"model": {k: v for k, v in BROWN_JM.items() if k != "backbone"},
           "model_v0": {"attention": {"type": "brown"}}}
    p = CLIParams.from_json(raw)
    assert p.model.brown_layers == (0, 1, 2)
