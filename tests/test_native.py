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
