"""Data layer: shard roundtrip (reference binary format), dataset batching
determinism, BPE tokenizer, ChatML templates, hellaswag records, eval."""
import numpy as np
import pytest

from koifish_tpu.data import (
    BPETokenizer, TokenDataset, read_hellaswag_shard, read_shard, write_shard,
    MAGIC_GPT2, MAGIC_QWEN3, MAGIC_HELLASWAG,
)
from koifish_tpu.data.chat_template import (
    render_chatml, sft_sample_to_tokens)
from koifish_tpu.data.tokenset import HEADER_INTS


def test_shard_roundtrip_qwen3(tmp_path):
    path = str(tmp_path / "a_train_000.bin")
    toks = np.arange(1000, dtype=np.uint32) % 777
    write_shard(path, toks, MAGIC_QWEN3, vocab_size=777)
    out, mask, info = read_shard(path)
    np.testing.assert_array_equal(np.asarray(out), toks)
    assert mask is None
    assert info["magic"] == MAGIC_QWEN3 and info["vocab_size"] == 777
    # byte-level compat: header really is 256 int32 with magic at [0]
    raw = np.fromfile(path, dtype=np.int32, count=HEADER_INTS)
    assert raw[0] == MAGIC_QWEN3 and raw[1] == 1 and raw[2] == 1000 and raw[3] == 4


def test_shard_roundtrip_gpt2_uint16(tmp_path):
    path = str(tmp_path / "g.bin")
    toks = np.arange(500, dtype=np.uint16)
    write_shard(path, toks, MAGIC_GPT2, vocab_size=50257)
    out, _, info = read_shard(path)
    assert out.dtype == np.uint16 and info["bpt"] == 2
    np.testing.assert_array_equal(np.asarray(out), toks)


def test_shard_masks_roundtrip(tmp_path):
    path = str(tmp_path / "m.bin")
    toks = np.arange(100, dtype=np.uint32)
    mask = (np.arange(100) % 3 == 0)
    write_shard(path, toks, MAGIC_QWEN3, masks=mask)
    _, out_mask, _ = read_shard(path)
    np.testing.assert_array_equal(out_mask, mask)


def test_dataset_batches_deterministic(tmp_path):
    for i in range(2):
        write_shard(str(tmp_path / f"x_train_{i}.bin"),
                    np.arange(2000, dtype=np.uint32) + i, MAGIC_QWEN3)
    ds = TokenDataset(str(tmp_path / "x_train_*.bin"))
    assert ds.total == 4000
    b1 = list(ds.batches(batch=4, seq_len=32, seed=7))
    b2 = list(ds.batches(batch=4, seq_len=32, seed=7))
    assert len(b1) > 0
    np.testing.assert_array_equal(b1[0]["tokens"], b2[0]["tokens"])
    assert b1[0]["tokens"].shape == (1, 4, 33)
    b3 = list(ds.batches(batch=4, seq_len=32, seed=8))
    assert not np.array_equal(b1[0]["tokens"], b3[0]["tokens"])


def test_dataset_grad_accum_shape(tmp_path):
    write_shard(str(tmp_path / "y.bin"), np.arange(5000, dtype=np.uint32))
    ds = TokenDataset(str(tmp_path / "y.bin"))
    b = next(ds.batches(batch=2, seq_len=16, accum=3))
    assert b["tokens"].shape == (3, 2, 17)


def _tiny_tokenizer():
    # toy byte-level vocab: all single bytes + a few merges
    from koifish_tpu.data.tokenizer import _bytes_to_unicode
    b2u = _bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u[b] for b in range(256))}
    def u(s):
        return "".join(b2u[b] for b in s.encode())
    merges = [(u("h"), u("e")), (u("l"), u("l")), (u("he"), u("ll")),
              (u("hell"), u("o"))]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return BPETokenizer(vocab, merges,
                        special_tokens={"<|endoftext|>": len(vocab)})


def test_bpe_tokenizer_roundtrip():
    tk = _tiny_tokenizer()
    ids = tk.encode("hello hello")
    assert tk.decode(ids) == "hello hello"
    # merges actually fire: "hello" is a single token
    assert len(tk.encode("hello")) == 1
    # special token handling
    ids = tk.encode("hello<|endoftext|>hello")
    assert tk.special["<|endoftext|>"] in ids
    assert tk.decode(ids) == "hello<|endoftext|>hello"
    # unicode safety
    s = "héllo 世界"
    assert tk.decode(tk.encode(s)) == s


def test_chatml_render_and_sft_mask():
    msgs = [{"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"}]
    text = render_chatml(msgs, add_generation_prompt=False)
    assert "<|im_start|>user\nhi<|im_end|>" in text
    tk = _tiny_tokenizer()
    toks, mask = sft_sample_to_tokens(tk, msgs)
    assert len(toks) == len(mask)
    assert any(mask) and not all(mask)   # loss only on assistant span


def test_hellaswag_shard(tmp_path):
    """Write an llm.c-format hellaswag shard and read it back."""
    path = str(tmp_path / "hs.bin")
    rng = np.random.default_rng(0)
    records = []
    n = 3
    for idx in range(n):
        label = int(rng.integers(0, 4))
        ctx = rng.integers(0, 100, size=5).astype(np.uint16)
        comps = [rng.integers(0, 100, size=int(rng.integers(2, 6))).astype(np.uint16)
                 for _ in range(4)]
        body = [np.array([label, len(ctx)], np.uint16), ctx]
        for c in comps:
            body += [np.array([len(c)], np.uint16), c]
        body = np.concatenate(body)
        ex_bytes = (3 + len(body)) * 2
        rec = np.concatenate([np.array([65535, ex_bytes, idx], np.uint16), body])
        records.append((label, ctx, comps, rec))
    header = np.zeros(HEADER_INTS, np.int32)
    header[0] = MAGIC_HELLASWAG
    header[1] = 1
    header[2] = n
    with open(path, "wb") as f:
        f.write(header.tobytes())
        for *_, rec in records:
            f.write(rec.tobytes())

    out = list(read_hellaswag_shard(path))
    assert len(out) == n
    label0, options0 = out[0]
    assert label0 == records[0][0]
    toks, mask = options0[1]
    np.testing.assert_array_equal(
        toks, np.concatenate([records[0][1], records[0][2][1]]).astype(np.int32))
    assert mask[:5].sum() == 0 and mask[5:].all()


def test_perplexity_and_hellaswag_eval(tmp_path):
    import jax
    from koifish_tpu.config import ModelCard
    from koifish_tpu.models import init_params
    from koifish_tpu.evaluate import perplexity, hellaswag_accuracy
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=1, n_embd=32,
                               n_head=2, n_kv_head=1, head_dim=16, n_ffn=64,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    write_shard(str(tmp_path / "v.bin"),
                np.random.default_rng(0).integers(0, 128, 3000).astype(np.uint32))
    ds = TokenDataset(str(tmp_path / "v.bin"))
    ce, ppl = perplexity(card, params, ds.batches(4, 32), max_batches=3)
    assert 3.0 < ce < 7.0 and abs(ppl - np.exp(ce)) < 1e-3
    # random model ≈ 25% hellaswag
    rng = np.random.default_rng(1)
    samples = []
    for _ in range(8):
        opts = []
        for _ in range(4):
            t = rng.integers(0, 128, 12).astype(np.int32)
            m = np.zeros(12, bool); m[6:] = True
            opts.append((t, m))
        samples.append((int(rng.integers(0, 4)), opts))
    acc = hellaswag_accuracy(card, params, samples, seq_len=16)
    assert 0.0 <= acc <= 1.0
