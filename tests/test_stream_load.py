"""Streaming sharded quantize-at-load (io/stream_load) — the Qwen3-32B
serving path (reference LoadFolderOfST + Serial_Quant_MMAP,
Serialize.cpp:1018, huTensor.cu:487; README.md:23).

Two claims tested:
1. parity — the streamed result is leaf-for-leaf identical to the
   reference path (load_hf_model → quantize_params → shard_params);
2. boundedness — at dims-true Qwen3-32B shapes (E=5120, V=151936, real
   head counts, real FFN), host anonymous RSS never approaches the full
   bf16 model size: tensors stream through one at a time.
"""
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koifish_tpu.config import ModelCard, QuantCard
from koifish_tpu.parallel import make_mesh, shard_params
from koifish_tpu.quant.apply import quantize_params
from koifish_tpu.quant.qtensor import QTensor

from helpers import make_hf_qwen3_dir


def tiny_card():
    return ModelCard.from_arch(
        "QWEN3", vocab_size=512, n_layer=2, n_embd=128, n_head=8,
        n_kv_head=4, head_dim=16, n_ffn=256, n_ctx=64, max_pos=128)


QC = {"self_attn": {"bits": 4}, "mlp": {"bits": 4}, "group_size": 32}


def test_stream_load_matches_reference_path(tmp_path, monkeypatch):
    from koifish_tpu.io import stream_load
    from koifish_tpu.io.hf_loader import load_hf_model
    from koifish_tpu.io.stream_load import load_hf_sharded_quantized

    # force multi-chunk streaming on the tiny tensors (128-row chunks) —
    # column chunking must be EXACT vs whole-tensor quantization
    monkeypatch.setattr(stream_load, "CHUNK_BYTES", 1)

    card = tiny_card()
    make_hf_qwen3_dir(tmp_path, card)
    qcard = QuantCard.from_json(QC)
    mesh = make_mesh({"tp": 4})

    ref_card, ref_params = load_hf_model(str(tmp_path))
    ref = shard_params(quantize_params(ref_params, qcard, ref_card), mesh)

    got_card, got = load_hf_sharded_quantized(str(tmp_path), mesh, qcard)
    assert got_card.n_layer == card.n_layer

    ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
    got_leaves = jax.tree_util.tree_leaves_with_path(got)
    assert len(ref_leaves) == len(got_leaves)
    n_q = 0
    for (pa, a), (pb, b) in zip(ref_leaves, got_leaves):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32),
            err_msg=jax.tree_util.keystr(pa))
        n_q += ".codes" in jax.tree_util.keystr(pb)
    # qkvo + gate/up/down per layer (the self_attn/mlp rules; wte has no
    # rule in this card, mirroring the reference's qwen3 quantizer configs)
    assert n_q == card.n_layer * 7

    # every QTensor landed SHARDED on the tp axis (codes 2D: one dim tp)
    def check(w):
        if isinstance(w, QTensor):
            spec = w.codes.sharding.spec
            assert "tp" in tuple(spec), spec
    jax.tree_util.tree_map(
        check, got, is_leaf=lambda x: isinstance(x, QTensor))

    # and serves: sharded prefill == unsharded prefill
    from koifish_tpu.serve import cache_for, prefill
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 512)
    q_single = quantize_params(ref_params, qcard, ref_card)
    l0, _ = prefill(card, q_single, tokens, cache_for(card, 2, 32))
    jit_prefill = jax.jit(prefill, static_argnames=("card",))
    l1, _ = jit_prefill(card, got, tokens, cache_for(card, 2, 32))
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=2e-2, atol=2e-2)


def test_stream_load_rejects_unsupported():
    from koifish_tpu.io.stream_load import load_hf_sharded_quantized
    card = ModelCard.from_arch(
        "GPT2", vocab_size=128, n_layer=1, n_embd=64, n_head=4, n_kv_head=4,
        head_dim=16, n_ffn=128, n_ctx=32, max_pos=32)
    with pytest.raises(NotImplementedError):
        load_hf_sharded_quantized("/nonexistent", make_mesh({"tp": 4}),
                                  card=card)


_32B_SCRIPT = r"""
import json, os, threading, time, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

def anon_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon"):
                return int(line.split()[1]) / 1024.0
    return 0.0

folder = sys.argv[1]
n_layer = int(sys.argv[2])

from koifish_tpu.config import QuantCard
from koifish_tpu.io.stream_load import load_hf_sharded_quantized
from koifish_tpu.parallel import make_mesh
from koifish_tpu.quant.qtensor import QTensor

peak = [anon_mb()]
stop = [False]
def track():
    while not stop[0]:
        peak[0] = max(peak[0], anon_mb())
        time.sleep(0.02)
t = threading.Thread(target=track, daemon=True); t.start()

base = anon_mb()
mesh = make_mesh({"tp": 8})
# the full 32B serving recipe: INT4 linears, INT8 embed/head (tied)
qcard = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                             "embed_tokens": {"bits": 8},
                             "group_size": 128})
card, params = load_hf_sharded_quantized(folder, mesh, qcard)
stop[0] = True; t.join()

# every rule-matched weight became a sharded QTensor
n_q = 0
def check(w):
    global n_q
    if isinstance(w, QTensor):
        n_q += 1
        assert "tp" in tuple(w.codes.sharding.spec), w.codes.sharding
        assert len(w.codes.sharding.device_set) == 8
for lp in params["layers"]:
    for w in lp.values():
        check(w)
check(params["wte"])
assert n_q == n_layer * 7 + 1, n_q

E, V, F = card.n_embd, card.vocab_size, card.n_ffn
full_bf16_mb = (V * E + n_layer * (E * (card.n_head + 2 * card.n_kv_head)
                * card.head_dim + E * card.n_head * card.head_dim
                + 3 * E * F)) * 2 / 1024 ** 2
peak_mb = peak[0] - base
print(json.dumps({"peak_anon_mb": round(peak_mb), "full_bf16_mb":
                  round(full_bf16_mb), "E": E, "V": V}))
assert peak_mb < full_bf16_mb, (
    f"streaming load peaked at {peak_mb:.0f} MB anon — >= the full bf16 "
    f"model ({full_bf16_mb:.0f} MB): not streaming")

# kernel eligibility at 32B dims (VERDICT r4 #2): the serving fast paths
# must engage at E=5120
from koifish_tpu.ops.pallas import flash, matmul, fused_ce
import jax.numpy as jnp
flash.set_interpret(True); fused_ce.set_interpret(True)
q = jax.ShapeDtypeStruct((1, 1024, card.n_head, card.head_dim), jnp.bfloat16)
k = jax.ShapeDtypeStruct((1, 1024, card.n_kv_head, card.head_dim), jnp.bfloat16)
assert flash._eligible(q, k, 0), "flash ineligible at 32B dims"
# GQA ratio 8 with d=128 exceeds the column path's heads-per-block
# budget -> the head-major strip kernels carry it (also fused)
path = ("column" if flash._col_cfg(card.n_head, card.n_kv_head,
                                   card.head_dim) else "head-major")
print("flash path at 32B dims:", path)
# fused GEMV/GEMM gates: every 32B weight K is 1024-aligned, N 128-aligned
for kk, nn in ((E, card.n_head * 128), (E, F), (F, E), (E, V)):
    assert kk % 1024 == 0 and nn % 128 == 0, (kk, nn)
# fused CE at E=5120: narrower vocab tiles (_bv_for 1024->512) keep the
# dw accumulator in VMEM — 32B training gets the fused classifier too
assert fused_ce.eligible(4096, E, V), "fused_ce ineligible at 32B dims"
assert fused_ce._bv_for(E) == 512
print("STREAM-32B OK")
"""


def test_stream_load_32b_shaped(tmp_path):
    """Dims-true Qwen3-32B rehearsal (layer-truncated): E=5120, V=151936,
    64 q-heads / 8 kv-heads / head_dim 128, FFN 27648. Runs in a fresh
    subprocess so the RSS high-water mark is the loader's own."""
    card = ModelCard.from_arch(
        "QWEN3", vocab_size=151936, n_layer=2, n_embd=5120, n_head=64,
        n_kv_head=8, head_dim=128, n_ffn=27648, n_ctx=1024, max_pos=40960)
    _write_32b_dir(tmp_path, card)
    proc = subprocess.run(
        [sys.executable, "-c", _32B_SCRIPT, str(tmp_path),
         str(card.n_layer)],
        capture_output=True, text=True, timeout=1200,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "STREAM-32B OK" in proc.stdout, proc.stdout
    stats = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][0])
    # headroom report, not just pass/fail (the margin is the evidence)
    print("32b stream stats:", stats)


def _write_32b_dir(path, card, seed=0):
    """Random bf16 checkpoint at true 32B dims — built from one shared
    random block per shape family to keep fixture time O(GB write)."""
    import ml_dtypes
    from koifish_tpu.io.safetensors import write_safetensors
    rng = np.random.default_rng(seed)
    E, D = card.n_embd, card.head_dim
    blk = (rng.standard_normal((1024, 1024), dtype=np.float32) * 0.02
           ).astype(ml_dtypes.bfloat16)

    def w(shape):
        reps = (-(-shape[0] // 1024), -(-shape[1] // 1024))
        return np.ascontiguousarray(
            np.tile(blk, reps)[: shape[0], : shape[1]])

    ones = np.ones((E,), ml_dtypes.bfloat16)
    tensors = {
        "model.embed_tokens.weight": w((card.vocab_size, E)),
        "model.norm.weight": ones,
    }
    for i in range(card.n_layer):
        pre = f"model.layers.{i}."
        tensors.update({
            pre + "input_layernorm.weight": ones,
            pre + "self_attn.q_proj.weight": w((card.n_head * D, E)),
            pre + "self_attn.k_proj.weight": w((card.n_kv_head * D, E)),
            pre + "self_attn.v_proj.weight": w((card.n_kv_head * D, E)),
            pre + "self_attn.o_proj.weight": w((E, card.n_head * D)),
            pre + "self_attn.q_norm.weight": np.ones((D,), ml_dtypes.bfloat16),
            pre + "self_attn.k_norm.weight": np.ones((D,), ml_dtypes.bfloat16),
            pre + "post_attention_layernorm.weight": ones,
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


def test_stream_load_multifile_index(tmp_path, monkeypatch):
    """HF multi-file checkpoints (model.safetensors.index.json) stream
    identically to the single-file layout — the real Qwen3-32B ships as
    ~17 shards."""
    import os
    from koifish_tpu.io import stream_load
    from koifish_tpu.io.safetensors import read_safetensors, write_safetensors
    from koifish_tpu.io.stream_load import load_hf_sharded_quantized

    monkeypatch.setattr(stream_load, "CHUNK_BYTES", 1)
    card = tiny_card()
    make_hf_qwen3_dir(tmp_path, card)
    single, _ = read_safetensors(str(tmp_path / "model.safetensors"))
    names = sorted(single)
    half = len(names) // 2
    parts = {"model-00001-of-00002.safetensors": names[:half],
             "model-00002-of-00002.safetensors": names[half:]}
    multi = tmp_path / "multi"
    multi.mkdir()
    weight_map = {}
    for fname, keys in parts.items():
        write_safetensors(str(multi / fname), {k: single[k] for k in keys})
        weight_map.update({k: fname for k in keys})
    with open(multi / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    for aux in ("config.json",):
        (multi / aux).write_bytes((tmp_path / aux).read_bytes())

    qcard = QuantCard.from_json(QC)
    mesh = make_mesh({"tp": 4})
    _, a = load_hf_sharded_quantized(str(tmp_path), mesh, qcard)
    _, b = load_hf_sharded_quantized(str(multi), mesh, qcard)
    for (pa, la), (pb, lb) in zip(jax.tree_util.tree_leaves_with_path(a),
                                  jax.tree_util.tree_leaves_with_path(b)):
        np.testing.assert_array_equal(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            err_msg=jax.tree_util.keystr(pa))
