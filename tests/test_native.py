"""C++ native layer: builds, and matches the pure-Python paths exactly."""
import numpy as np
import pytest

from koifish_tpu.native import NativeBPE, NativeShard, native_available
from tests.helpers import byte_level_tokenizer_json

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _tokenizer():
    from koifish_tpu.data.tokenizer import BPETokenizer
    tj = byte_level_tokenizer_json()
    vocab = tj["model"]["vocab"]
    merges = [tuple(m.split(" ", 1)) for m in tj["model"]["merges"]]
    special = {t["content"]: t["id"] for t in tj["added_tokens"]}
    return BPETokenizer(vocab, merges, special_tokens=special)


def test_native_bpe_matches_python():
    tk = _tokenizer()
    engine = NativeBPE(tk)
    texts = ["hello", " world", "hello world hello", "héllo 世界", "x" * 500]
    for t in texts:
        pretokens = [m.group() for m in tk.pat.finditer(t)]
        py = []
        for p in pretokens:
            py.extend(tk._bpe(p))
        nat = engine.encode_pretokens(pretokens)
        assert nat == py, t


def test_tokenizer_uses_native_transparently():
    tk = _tokenizer()
    ids = tk.encode("hello<|im_end|>hello world")
    assert tk._native is not None  # engine built
    assert tk.decode(ids) == "hello<|im_end|>hello world"


def test_native_shard_gather(tmp_path):
    from koifish_tpu.data import write_shard, MAGIC_QWEN3, MAGIC_GPT2
    toks = (np.arange(5000) * 7 % 997).astype(np.uint32)
    p = str(tmp_path / "s.bin")
    write_shard(p, toks, MAGIC_QWEN3, vocab_size=997)
    sh = NativeShard(p)
    assert sh.count == 5000 and sh.bpt == 4
    offs = np.array([0, 100, 4900], np.int64)
    out = sh.gather(offs, 100)
    for i, o in enumerate(offs):
        np.testing.assert_array_equal(out[i], toks[o:o + 100].astype(np.int32))
    # uint16 shards too
    p2 = str(tmp_path / "g.bin")
    write_shard(p2, (np.arange(1000) % 50000).astype(np.uint16), MAGIC_GPT2)
    sh2 = NativeShard(p2)
    assert sh2.bpt == 2
    np.testing.assert_array_equal(sh2.gather(np.array([10], np.int64), 20)[0],
                                  np.arange(10, 30, dtype=np.int32))


def test_native_safetensors_matches_python_reader(tmp_path):
    """C++ mmap safetensors parser (K_SafeTensors::MMAP analog) returns
    byte-identical views vs the python reader, incl. the koifish .kun
    header dialect with extra keys."""
    import numpy as np
    import ml_dtypes
    import pytest
    from koifish_tpu.native import NativeSafetensors, native_available
    from koifish_tpu.io.safetensors import read_safetensors, write_safetensors
    from koifish_tpu.io.kun import write_kun
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((33, 16), dtype=np.float32),
        "b/bias": rng.standard_normal((8,), dtype=np.float32
                                      ).astype(ml_dtypes.bfloat16),
        "c": rng.integers(0, 255, (4, 4), dtype=np.uint8),
    }
    p = str(tmp_path / "m.safetensors")
    write_safetensors(p, tensors, metadata={"x": "1"})
    nst = NativeSafetensors(p)
    ref, _ = read_safetensors(p)
    got = nst.tensors()
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]).view(np.uint8),
                                      np.asarray(ref[k]).view(np.uint8))
    # koifish dialect (.kun with msgpack config tensor + extra keys)
    kp = str(tmp_path / "m.kun")
    write_kun(kp, {"seed": 1}, {"w": tensors["a.weight"]})
    nk = NativeSafetensors(kp)
    kt = nk.tensors()
    assert "__koifish__config__" in kt and "w" in kt
    np.testing.assert_array_equal(np.asarray(kt["w"]),
                                  tensors["a.weight"])


def test_native_batch_server_matches_python(tmp_path):
    """NativeBatchServer (C++ prefetch thread) must reproduce the python
    batch stream bit-exactly: same shards, same seed, same order."""
    import numpy as np

    from koifish_tpu.data.tokenset import TokenDataset, write_shard

    rng = np.random.default_rng(0)
    for i in range(2):
        toks = rng.integers(0, 50000, size=4000, dtype=np.uint32)
        write_shard(str(tmp_path / f"s{i}.bin"), toks, magic=20251218)
    ds = TokenDataset(str(tmp_path / "s*.bin"))

    native = [b["tokens"].copy() for b in
              ds.batches(batch=4, seq_len=64, seed=7, epochs=2)]

    # force the python path by making masks "present"
    ds2 = TokenDataset(str(tmp_path / "s*.bin"))
    ds2.shards = [(t, np.ones(len(t), bool)) for t, _ in ds2.shards]
    python = [b["tokens"].copy() for b in
              ds2.batches(batch=4, seq_len=64, seed=7, epochs=2)]

    assert len(native) == len(python) > 4
    for a, b in zip(native, python):
        np.testing.assert_array_equal(a, b)
