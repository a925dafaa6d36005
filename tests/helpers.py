"""Shared fixtures: fake tiny HF model dirs (weights + config + tokenizer)."""
import json

import ml_dtypes
import numpy as np

from koifish_tpu.io.safetensors import write_safetensors


def byte_level_tokenizer_json(specials=("<|endoftext|>", "<|im_start|>",
                                        "<|im_end|>")):
    """Minimal byte-level BPE tokenizer.json: 256 byte tokens + a few
    merges + special tokens."""
    from koifish_tpu.data.tokenizer import _bytes_to_unicode
    b2u = _bytes_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}

    def u(s):
        return "".join(b2u[c] for c in s.encode())

    merges = [[u("h"), u("e")], [u("l"), u("l")], [u("he"), u("ll")],
              [u("hell"), u("o")], [u(" "), u("w")]]
    nid = 256
    for a, b in merges:
        vocab[a + b] = nid
        nid += 1
    added = []
    for s in specials:
        added.append({"content": s, "id": nid})
        nid += 1
    return {
        "model": {"type": "BPE", "vocab": vocab,
                  "merges": [f"{a} {b}" for a, b in merges]},
        "added_tokens": added,
        "pre_tokenizer": {"type": "ByteLevel"},
    }


def make_hf_qwen3_dir(path, card, seed=0):
    """Write config.json + model.safetensors + tokenizer.json for a tiny
    Qwen3 with random weights."""
    rng = np.random.default_rng(seed)
    E, D = card.n_embd, card.head_dim

    def w(shape, scale=0.05):
        return (rng.standard_normal(shape, dtype=np.float32) * scale
                ).astype(ml_dtypes.bfloat16)

    tensors = {
        "model.embed_tokens.weight": w((card.vocab_size, E)),
        "model.norm.weight": np.ones((E,), ml_dtypes.bfloat16),
    }
    for i in range(card.n_layer):
        pre = f"model.layers.{i}."
        tensors.update({
            pre + "input_layernorm.weight": np.ones((E,), ml_dtypes.bfloat16),
            pre + "self_attn.q_proj.weight": w((card.n_head * D, E)),
            pre + "self_attn.k_proj.weight": w((card.n_kv_head * D, E)),
            pre + "self_attn.v_proj.weight": w((card.n_kv_head * D, E)),
            pre + "self_attn.o_proj.weight": w((E, card.n_head * D)),
            pre + "self_attn.q_norm.weight": np.ones((D,), ml_dtypes.bfloat16),
            pre + "self_attn.k_norm.weight": np.ones((D,), ml_dtypes.bfloat16),
            pre + "post_attention_layernorm.weight": np.ones((E,), ml_dtypes.bfloat16),
            pre + "mlp.gate_proj.weight": w((card.n_ffn, E)),
            pre + "mlp.up_proj.weight": w((card.n_ffn, E)),
            pre + "mlp.down_proj.weight": w((E, card.n_ffn)),
        })
    write_safetensors(str(path / "model.safetensors"), tensors)
    with open(path / "config.json", "w") as f:
        json.dump({
            "model_type": "qwen3", "vocab_size": card.vocab_size,
            "num_hidden_layers": card.n_layer, "hidden_size": E,
            "num_attention_heads": card.n_head,
            "num_key_value_heads": card.n_kv_head, "head_dim": D,
            "intermediate_size": card.n_ffn, "rope_theta": 1e6,
            "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
            "max_position_embeddings": card.max_pos}, f)
    with open(path / "tokenizer.json", "w") as f:
        json.dump(byte_level_tokenizer_json(), f)


def make_hf_awq_qwen3_dir(path, card, seed=0, group=64):
    """Write a fake AWQ-quantized HF dir (qweight/qzeros/scales triples)."""
    import numpy as np
    from koifish_tpu.quant.awq import AWQ_ORDER
    rng = np.random.default_rng(seed)
    E, D = card.n_embd, card.head_dim

    def pack_awq(codes):
        rows, cols = codes.shape
        c = codes.reshape(rows, cols // 8, 8).astype(np.uint32)
        out = np.zeros((rows, cols // 8), np.uint32)
        for slot in range(8):
            out |= c[:, :, AWQ_ORDER[slot]] << (4 * slot)
        return out.astype(np.int32)

    def awq_triple(n_in, n_out):
        codes = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
        zeros = rng.integers(7, 9, (n_in // group, n_out)).astype(np.uint8)
        scales = (rng.random((n_in // group, n_out), np.float32) * 0.01
                  + 0.005).astype(np.float16)
        return pack_awq(codes), pack_awq(zeros), scales

    tensors = {
        "model.embed_tokens.weight": (rng.standard_normal(
            (card.vocab_size, E), dtype=np.float32) * 0.05
            ).astype(ml_dtypes.bfloat16),
        "model.norm.weight": np.ones((E,), ml_dtypes.bfloat16),
    }
    for i in range(card.n_layer):
        pre = f"model.layers.{i}."
        for name, n_in, n_out in [
                ("self_attn.q_proj", E, card.n_head * D),
                ("self_attn.k_proj", E, card.n_kv_head * D),
                ("self_attn.v_proj", E, card.n_kv_head * D),
                ("self_attn.o_proj", card.n_head * D, E),
                ("mlp.gate_proj", E, card.n_ffn),
                ("mlp.up_proj", E, card.n_ffn),
                ("mlp.down_proj", card.n_ffn, E)]:
            qw, qz, sc = awq_triple(n_in, n_out)
            tensors[pre + name + ".qweight"] = qw
            tensors[pre + name + ".qzeros"] = qz
            tensors[pre + name + ".scales"] = sc
        tensors[pre + "input_layernorm.weight"] = np.ones((E,), ml_dtypes.bfloat16)
        tensors[pre + "post_attention_layernorm.weight"] = np.ones((E,), ml_dtypes.bfloat16)
        tensors[pre + "self_attn.q_norm.weight"] = np.ones((D,), ml_dtypes.bfloat16)
        tensors[pre + "self_attn.k_norm.weight"] = np.ones((D,), ml_dtypes.bfloat16)
    write_safetensors(str(path / "model.safetensors"), tensors)
    with open(path / "config.json", "w") as f:
        json.dump({
            "model_type": "qwen3", "vocab_size": card.vocab_size,
            "num_hidden_layers": card.n_layer, "hidden_size": E,
            "num_attention_heads": card.n_head,
            "num_key_value_heads": card.n_kv_head, "head_dim": D,
            "intermediate_size": card.n_ffn, "rope_theta": 1e6,
            "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
            "max_position_embeddings": card.max_pos,
            "quantization_config": {"quant_method": "awq", "bits": 4,
                                    "group_size": group}}, f)
    with open(path / "tokenizer.json", "w") as f:
        json.dump(byte_level_tokenizer_json(), f)
