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
