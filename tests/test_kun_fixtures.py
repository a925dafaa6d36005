"""Byte-true interop fixtures for the reference's on-disk formats.

Round 2's interop tests were self-roundtrip only (write_kun → read_kun):
a misreading of the reference layout would pass every test. These
fixtures are HAND-BUILT byte-by-byte from the reference source — never
from this repo's writers — so a drifted offset, dtype, or key breaks
them:

- .kun header:   8B little-endian size + nlohmann-dump JSON (compact,
                 keys alphabetically sorted; ``_to_memory`` pads with
                 0x20 to 8B), entries carrying data_offsets/dtype/loAB/
                 shape/szData/szGama (Serialize.cpp:87-95, _to_ofs
                 Serialize.cpp:561-596, InitHeader :978-1001)
- config tensor: "__koifish__config__" (Safetensors.cpp:13) whose data
                 region is nlohmann to_msgpack of
                 {"CLI_params": {"config": ...}} (Safetensors.hpp:88-99,
                 Serialize.cpp:465-475)
- .ckp regions:  [data | gama | m | v] (huTensor.cu:501-515, 574-578);
                 gama is bf16 (floatGama, g_float.hpp:261), moments are
                 bf16 (floatMV, g_float.hpp:249), and nByte_CKP gives
                 sz*3 + szGama for STATE (Serialize.cpp:236-247)
- tokenizer.dat: <III header (max_token_length, bos, eos) then per token
                 <f score, <I length, raw bytes (PreTokenizer.py:136-146)
"""
import json
import struct

import ml_dtypes
import numpy as np

from koifish_tpu.io.kun import (msgpack_decode, msgpack_encode, read_ckp,
                                read_kun, read_tokenizer_dat)


def _bf16(*vals):
    return np.array(vals, dtype=ml_dtypes.bfloat16)


# nlohmann::json::to_msgpack of {"CLI_params":{"config":{"model":
# {"arch":"QWEN3","layer":2},"seed":42}}} — maps are std::map
# (alphabetical), compact int encoding (positive fixint), fixstr/fixmap.
_CONFIG_MSGPACK = bytes([
    0x81,                                            # fixmap(1)
    0xAA, *b"CLI_params",                            # fixstr(10)
    0x81,                                            # fixmap(1)
    0xA6, *b"config",                                # fixstr(6)
    0x82,                                            # fixmap(2): model<seed
    0xA5, *b"model",
    0x82,                                            # arch<layer
    0xA4, *b"arch", 0xA5, *b"QWEN3",
    0xA5, *b"layer", 0x02,                           # positive fixint
    0xA4, *b"seed", 0x2A,                            # 42
])
_CONFIG_JSON = {"model": {"arch": "QWEN3", "layer": 2}, "seed": 42}


def _write_container(path, header_json_str: str, regions: bytes):
    """8-byte LE header size + JSON (0x20-padded to 8B like the
    reference's _to_memory, Serialize.cpp:703-719) + data buffer."""
    hs = header_json_str.encode()
    pad = (-len(hs)) % 8
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hs) + pad))
        f.write(hs + b"\x20" * pad)
        f.write(regions)


def test_kun_fixture_hand_built(tmp_path):
    """A .kun built byte-by-byte from the reference layout parses into
    the right config, weights, and gama scales."""
    w = _bf16(1.0, -2.0, 0.5, 4.0, -0.25, 8.0, 1.5, -1.0).reshape(2, 4)
    wb = w.tobytes()                       # 16 bytes
    n_mp = len(_CONFIG_MSGPACK)
    # nlohmann dump: compact, all keys alphabetical at every level
    header = (
        '{"__koifish__config__":{"data_offsets":[0,%d],"dtype":"U8",'
        '"loAB":0,"shape":[%d],"szData":0,"szGama":0},'
        '"__metadata__":{"format":"pt"},'
        '"blk.0.ffn_up.weight":{"data_offsets":[%d,%d],"dtype":"BF16(E8)",'
        '"loAB":0,"shape":[2,4],"szData":16,"szGama":0}}'
        % (n_mp, n_mp, n_mp, n_mp + 16))
    p = str(tmp_path / "hand.kun")
    _write_container(p, header, _CONFIG_MSGPACK + wb)

    config, tensors = read_kun(p)
    assert config == _CONFIG_JSON
    t = tensors["blk.0.ffn_up.weight"]
    assert t.dtype_name == "BF16(E8)" and t.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(t.data, np.float32),
                                  np.asarray(w, np.float32))
    assert t.gama is None and t.m is None and t.v is None


def test_ckp_fixture_state_regions(tmp_path):
    """A STATE .ckp region [data|gama|m|v] with the reference's dtypes:
    bf16 data, bf16 gama (floatGama — NOT f32), bf16 m/v (floatMV)."""
    data = _bf16(0.5, -1.5, 2.0, -3.0)     # szData = 8
    gama = _bf16(0.125, 4.0)               # szGama = 4  (bf16!)
    m = _bf16(0.01, 0.02, 0.03, 0.04)      # szM = 8
    v = _bf16(1e-4, 2e-4, 3e-4, 4e-4)      # szV = 8
    region = data.tobytes() + gama.tobytes() + m.tobytes() + v.tobytes()
    assert len(region) == 28               # nByte_CKP: 8*3 + 4
    header = (
        '{"__metadata__":{"format":"pt"},'
        '"w":{"data_offsets":[0,28],"dtype":"BF16(E8)","loAB":0,'
        '"shape":[2,2],"szData":8,"szGama":4}}')
    p = str(tmp_path / "hand.ckp")
    _write_container(p, header, region)

    _, tensors = read_ckp(p)
    t = tensors["w"]
    np.testing.assert_array_equal(np.asarray(t.data, np.float32).ravel(),
                                  np.asarray(data, np.float32))
    np.testing.assert_array_equal(np.asarray(t.gama, np.float32),
                                  np.asarray(gama, np.float32))
    np.testing.assert_array_equal(np.asarray(t.m, np.float32),
                                  np.asarray(m, np.float32))
    np.testing.assert_array_equal(np.asarray(t.v, np.float32),
                                  np.asarray(v, np.float32))


def test_msgpack_codec_matches_nlohmann_fixture():
    """Own msgpack decode of the hand-encoded nlohmann bytes, and the
    encoder reproduces them exactly (same map order => same bytes)."""
    js = {"CLI_params": {"config": _CONFIG_JSON}}
    assert msgpack_decode(_CONFIG_MSGPACK) == js
    assert msgpack_encode(js) == _CONFIG_MSGPACK


def test_tokenizer_dat_fixture(tmp_path):
    """tokenizer.dat bytes exactly as PreTokenizer.py:136-146 writes."""
    toks = [b"<s>", b"he", b"llo", b"\xe4\xbd\xa0"]
    scores = [-1e6, -0.6931471805599453, -1.0986122886681098, -1e6]
    raw = struct.pack("<III", 3, 0, 2)     # max_len, bos, eos
    for t, s in zip(toks, scores):
        raw += struct.pack("f", s) + struct.pack("<I", len(t)) + t
    p = str(tmp_path / "tokenizer.dat")
    with open(p, "wb") as f:
        f.write(raw)

    d = read_tokenizer_dat(p)
    assert d["max_token_length"] == 3
    assert d["bos_id"] == 0 and d["eos_id"] == 2
    assert d["tokens"] == toks
    np.testing.assert_allclose(d["scores"], scores, rtol=1e-6)
