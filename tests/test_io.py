"""IO: safetensors roundtrip + zero-copy mmap, HF folder loading (both
name schemes), checkpoint save/resume exactness."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import ml_dtypes

from koifish_tpu.config import ModelCard, QuantCard, TrainCard
from koifish_tpu.io import (
    iter_hf_folder, load_hf_model, load_model, load_model_card,
    load_train_state, read_safetensors, save_model, save_train_state,
    write_safetensors,
)
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.quant.apply import quantize_params
from koifish_tpu.train.trainer import init_train_state, make_train_step


def test_safetensors_roundtrip(tmp_path):
    path = str(tmp_path / "t.safetensors")
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.ones((2, 2), dtype=ml_dtypes.bfloat16),
        "c": np.array([1, 2, 3], dtype=np.int8),
    }
    write_safetensors(path, tensors, metadata={"hello": "world"})
    out, meta = read_safetensors(path)
    assert meta["hello"] == "world"
    for k in tensors:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(tensors[k]))
    # zero-copy: returned arrays are views over a memmap
    assert isinstance(out["a"].base, np.memmap) or out["a"].base is not None


def _fake_hf_qwen3(tmp_path, card):
    """Write a random HF-style qwen3 checkpoint (multi-file + index)."""
    rng = np.random.default_rng(0)
    E, D = card.n_embd, card.head_dim

    def w(shape):
        return rng.standard_normal(shape, dtype=np.float32).astype(ml_dtypes.bfloat16)

    tensors = {
        "model.embed_tokens.weight": w((card.vocab_size, E)),
        "model.norm.weight": w((E,)),
    }
    for i in range(card.n_layer):
        pre = f"model.layers.{i}."
        tensors.update({
            pre + "input_layernorm.weight": w((E,)),
            pre + "self_attn.q_proj.weight": w((card.n_head * D, E)),
            pre + "self_attn.k_proj.weight": w((card.n_kv_head * D, E)),
            pre + "self_attn.v_proj.weight": w((card.n_kv_head * D, E)),
            pre + "self_attn.o_proj.weight": w((E, card.n_head * D)),
            pre + "self_attn.q_norm.weight": w((D,)),
            pre + "self_attn.k_norm.weight": w((D,)),
            pre + "post_attention_layernorm.weight": w((E,)),
            pre + "mlp.gate_proj.weight": w((card.n_ffn, E)),
            pre + "mlp.up_proj.weight": w((card.n_ffn, E)),
            pre + "mlp.down_proj.weight": w((E, card.n_ffn)),
        })
    # split into two files with an index
    names = sorted(tensors)
    half = len(names) // 2
    files = {"model-00001.safetensors": names[:half],
             "model-00002.safetensors": names[half:]}
    weight_map = {}
    for fname, keys in files.items():
        write_safetensors(str(tmp_path / fname), {k: tensors[k] for k in keys})
        weight_map.update({k: fname for k in keys})
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(tmp_path / "config.json", "w") as f:
        json.dump({"model_type": "qwen3", "vocab_size": card.vocab_size,
                   "num_hidden_layers": card.n_layer, "hidden_size": E,
                   "num_attention_heads": card.n_head,
                   "num_key_value_heads": card.n_kv_head, "head_dim": D,
                   "intermediate_size": card.n_ffn, "rope_theta": 1e6,
                   "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
                   "max_position_embeddings": 128}, f)
    return tensors


def test_hf_load_qwen3(tmp_path):
    card = ModelCard.from_arch("QWEN3", vocab_size=256, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=64, max_pos=128)
    raw = _fake_hf_qwen3(tmp_path, card)
    loaded_card, params = load_hf_model(str(tmp_path))
    assert loaded_card.arch == "QWEN3" and loaded_card.n_layer == 2
    assert loaded_card.qk_norm
    # transpose check: our q is [E, HqD], HF stores [HqD, E]
    q = np.asarray(params["layers"][0]["q"], dtype=np.float32)
    hf_q = np.asarray(raw["model.layers.0.self_attn.q_proj.weight"],
                      dtype=np.float32)
    np.testing.assert_allclose(q, hf_q.T, rtol=1e-2)
    # forward runs
    logits = model_forward(loaded_card, params, jnp.ones((1, 8), jnp.int32))
    assert bool(jnp.isfinite(logits).all())


def test_checkpoint_roundtrip(tmp_path):
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    tcard = TrainCard(batch=4, lr=1e-3, warmup=0)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=10)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 4, 17), 0, 128)
    state, _ = step(state, {"tokens": tokens})

    path = str(tmp_path / "ck.safetensors")
    save_train_state(path, state, card, extra_meta={"iter": 1})
    template = init_train_state(card, tcard)
    restored, meta = load_train_state(path, template)
    assert json.loads(meta["iter"]) == 1
    assert int(restored.opt.step) == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # resumed training continues deterministically
    s1, m1 = step(state, {"tokens": tokens})
    s2, m2 = step(restored, {"tokens": tokens})
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6


def test_quantized_model_export(tmp_path):
    """Packed INT4 model saves & reloads byte-exact (single-file .kun
    analog with embedded card)."""
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    qcard = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                                 "group_size": 32})
    qparams = quantize_params(params, qcard)
    path = str(tmp_path / "model.kun.safetensors")
    save_model(path, qparams, card)
    assert load_model_card(path).n_layer == 2
    restored = load_model(path, qparams)
    t1 = model_forward(card, qparams, jnp.ones((1, 4), jnp.int32))
    t2 = model_forward(card, restored, jnp.ones((1, 4), jnp.int32))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # the file actually stores packed codes (sub-byte size win)
    size = os.path.getsize(path)
    bf16_size = sum(x.size * 2 for x in jax.tree_util.tree_leaves(params))
    assert size < bf16_size * 0.75
