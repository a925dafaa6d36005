"""Reference-format interop: .kun / .ckp / tokenizer.dat / msgpack.

Formats defined by the reference (cites in koifish_tpu/io/kun.py):
.kun = safetensors + msgpack config tensor __koifish__config__
(Safetensors.hpp:92-119, Safetensors.cpp:13); .ckp STATE regions are
[data|gama|m|v] (huTensor.cu:501-515); tokenizer.dat is the
PreTokenizer.py binary table (:136-146)."""
import struct

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from koifish_tpu.io.kun import (CONFIG_KEY, msgpack_decode, msgpack_encode,
                                read_kun, read_tokenizer_dat, write_kun,
                                write_tokenizer_dat)


def test_msgpack_roundtrip_and_known_bytes():
    cfg = {
        "model": {"arch": "QWEN3", "parameter": {"Layer": 2, "transformer": {
            "Ctx": 64, "Embed": 64, "Head": 4}}},
        "train": {"learning-rate": 6e-4, "batch": 16},
        "quantizer": {"self_attn": {"bits": 4}},
        "seed": 42, "neg": -7, "big": 1 << 40, "flag": True, "null": None,
        "list": [1, "two", 3.0, False],
        "longstr": "x" * 300,
    }
    assert msgpack_decode(msgpack_encode(cfg)) == cfg
    # known encodings (msgpack spec)
    assert msgpack_encode({"a": 1}) == b"\x81\xa1a\x01"
    assert msgpack_encode([None, True, False]) == b"\x93\xc0\xc3\xc2"
    assert msgpack_encode(-3) == b"\xfd"
    assert msgpack_encode(200) == b"\xcc\xc8"
    assert msgpack_decode(b"\xca" + struct.pack(">f", 2.0)) == 2.0


def test_kun_roundtrip_with_config(tmp_path):
    cfg = {"model": {"arch": "QWEN3", "vocab_size": 128,
                     "parameter": {"Layer": 1, "transformer": {
                         "Ctx": 32, "Embed": 64, "Head": 4, "KVHead": 2,
                         "head_dim": 16, "Ffn": 64}}}}
    rng = np.random.default_rng(0)
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal(
            (128, 64), dtype=np.float32).astype(ml_dtypes.bfloat16),
        "model.norm.weight": np.ones((64,), ml_dtypes.bfloat16),
    }
    path = str(tmp_path / "m.kun")
    write_kun(path, cfg, tensors)
    config, kt = read_kun(path)
    assert config == cfg
    assert set(kt) == set(tensors)
    t = kt["model.embed_tokens.weight"]
    assert t.dtype_name == "BF16(E8)" and t.shape == (128, 64)
    np.testing.assert_array_equal(
        np.asarray(t.data, np.float32),
        np.asarray(tensors["model.embed_tokens.weight"], np.float32))
    assert t.m is None and t.gama is None
    # raw header uses the koifish dialect (szData/szGama/loAB keys)
    from koifish_tpu.io.safetensors import read_header
    header, _ = read_header(path)
    entry = header["model.norm.weight"]
    assert {"szData", "szGama", "loAB"} <= set(entry)
    assert header[CONFIG_KEY]["dtype"] == "U8"


def test_ckp_state_moments_roundtrip(tmp_path):
    """STATE layout [data|m|v] (huTensor.cu:510: moments appended after
    the weight bytes)."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 16), dtype=np.float32).astype(
        ml_dtypes.bfloat16)
    m = rng.standard_normal((32, 16), dtype=np.float32)
    v = np.abs(rng.standard_normal((32, 16), dtype=np.float32))
    path = str(tmp_path / "s.ckp")
    write_kun(path, {"iter": 7}, {"w": w}, moments={"w": (m, v)})
    config, kt = read_kun(path)
    assert config == {"iter": 7}
    t = kt["w"]
    np.testing.assert_array_equal(np.asarray(t.data, np.float32),
                                  np.asarray(w, np.float32))
    np.testing.assert_allclose(np.asarray(t.m, np.float32).reshape(32, 16),
                               m, rtol=1e-2, atol=1e-2)   # bf16 storage
    np.testing.assert_allclose(np.asarray(t.v, np.float32).reshape(32, 16),
                               v, rtol=1e-2, atol=1e-2)


def test_tokenizer_dat_reference_layout(tmp_path):
    """Byte layout must match PreTokenizer.py:136-146 exactly."""
    toks = [b"<|endoftext|>", b"a", b"ab", "é".encode()]
    scores = [-1e6, -1e6, -0.6931, -1.0986]
    path = str(tmp_path / "tokenizer.dat")
    write_tokenizer_dat(path, toks, scores, bos_id=0, eos_id=0)
    # independent struct-level parse mirroring the reference writer
    with open(path, "rb") as f:
        raw = f.read()
    max_len, bos, eos = struct.unpack_from("<III", raw, 0)
    assert max_len == 13 and bos == 0 and eos == 0
    (s0,) = struct.unpack_from("<f", raw, 12)
    (n0,) = struct.unpack_from("<I", raw, 16)
    assert n0 == 13 and raw[20:33] == b"<|endoftext|>"
    d = read_tokenizer_dat(path)
    assert d["tokens"] == toks
    np.testing.assert_allclose(d["scores"], scores, rtol=1e-6)


def test_score_tokenizer_from_dat(tmp_path):
    """tokenizer.dat → ScoreTokenizer: greedy score-merge encode matches
    the merge-rank order the scores encode; decode roundtrips UTF-8."""
    import math
    from koifish_tpu.data.tokenizer import ScoreTokenizer
    # byte vocab + merges: (h,e)->he rank0, (l,l)->ll rank1, (he,ll)->hell rank2
    base = [bytes([b]) for b in range(256)]
    merged = [b"he", b"ll", b"hell"]
    toks = base + merged
    scores = [-1e6] * 256 + [-math.log(r + 1) for r in range(3)]
    path = str(tmp_path / "tokenizer.dat")
    write_tokenizer_dat(path, toks, scores, bos_id=0, eos_id=0)
    tk = ScoreTokenizer.from_tokenizer_dat(path)
    ids = tk.encode("hello")
    assert ids == [258, ord("o")], ids   # "hell" + "o"
    assert tk.decode(ids) == "hello"
    assert tk.decode(tk.encode("héllo…")) == "héllo…"


def test_load_kun_model_chats(tmp_path):
    """A .kun single-file model (config + HF-named bf16 tensors) loads and
    produces the same logits as the same weights via the HF folder path."""
    from tests.helpers import make_hf_qwen3_dir
    from koifish_tpu.config import ModelCard
    from koifish_tpu.io.hf_loader import load_hf_model, load_kun_model
    from koifish_tpu.io.safetensors import read_safetensors
    from koifish_tpu.models import model_forward

    card = ModelCard.from_arch("QWEN3", vocab_size=96, n_layer=2, n_embd=32,
                               n_head=2, n_kv_head=1, head_dim=16, n_ffn=64,
                               n_ctx=32, max_pos=64)
    hf = tmp_path / "hf"
    hf.mkdir()
    make_hf_qwen3_dir(hf, card)
    tensors, _ = read_safetensors(str(hf / "model.safetensors"))
    cfg = {"model": {"arch": "QWEN3", "vocab_size": 96,
                     "parameter": {"Layer": 2, "tie_word_embeddings": True,
                                   "max_pos_embeddings": 64,
                                   "transformer": {
                                       "Ctx": 32, "Embed": 32, "Head": 2,
                                       "KVHead": 1, "head_dim": 16,
                                       "Ffn": 64}}}}
    kun = str(tmp_path / "model.kun")
    write_kun(kun, cfg, dict(tensors))
    kcard, kparams, kcfg = load_kun_model(kun)
    assert kcard.n_layer == 2 and kcard.n_embd == 32
    hcard, hparams = load_hf_model(str(hf), card=card)
    toks = jnp.asarray([[1, 5, 9, 13]], jnp.int32)
    lk = model_forward(kcard, kparams, toks)
    lh = model_forward(hcard, hparams, toks)
    np.testing.assert_allclose(np.asarray(lk, np.float32),
                               np.asarray(lh, np.float32), atol=1e-3)
