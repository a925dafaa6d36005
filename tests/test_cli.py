"""CLI end-to-end: koifish trains from a reference-style config, bubble
chats from an HF dir, pangpi evaluates — mirroring the reference's golden
e2e pytest strategy (cases/test_lite.py)."""
import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from koifish_tpu.config import ModelCard
from koifish_tpu.data import write_shard, MAGIC_QWEN3
from tests.helpers import make_hf_qwen3_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(mod, *args, cwd=None, timeout=240):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    return subprocess.run(
        [sys.executable, "-m", f"koifish_tpu.cli.{mod}", *args],
        capture_output=True, text=True, timeout=timeout,
        cwd=cwd or REPO, env=env)


@pytest.fixture(scope="module")
def tiny_hf(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf")
    card = ModelCard.from_arch("QWEN3", vocab_size=300, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=64, max_pos=256)
    make_hf_qwen3_dir(d, card)
    return str(d), card


def test_koifish_train_cli(tmp_path, tiny_hf):
    hf_dir, card = tiny_hf
    seq = (np.arange(40000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "p_train_0.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "model": {"arch": "QWEN3", "vocab_size": 300,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 64,
                                                "Ffn": 128, "Head": 4,
                                                "KVHead": 2, "head_dim": 16}}},
        "train": {"batch": 8, "learning-rate": 0.01, "dump-every": 5,
                  "warmup": 3,
                  "optimizatioin": {"method": "adamw", "grad_accumulation": 1}},
        "datasets": {"train": {"glob": str(tmp_path / "p_train_*.bin"),
                               "name": "pattern"}},
        "debug": {"most_iter": 25},
        "seed": 42,
    }
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    csvp = str(tmp_path / "koifish_loss.csv")
    assert os.path.exists(csvp)
    with open(csvp) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 25
    first, last = float(rows[0]["loss"]), float(rows[-1]["loss"])
    assert last < first * 0.5, f"loss {first} -> {last}"
    # CLI-level PINNED golden (config parse -> data -> trainer wiring):
    # the reference pins loss values, not just loss drops
    # (CheckResult rel_tol=1e-3, cases/test_lite.py:17-34). A wiring
    # regression that merely slows convergence now fails here.
    import math
    # re-pinned r5: bf16 stochastic rounding default-on
    assert math.isclose(last, 0.0404555, rel_tol=2e-3), last


def test_koifish_gpt_every_cli(tmp_path, tiny_hf):
    """train.gpt-every produces in-training chat samples (the reference's
    Optimizer::Evaluate chat hook, Optimizer.cpp:717-749)."""
    hf_dir, card = tiny_hf
    seq = (np.arange(40000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "p_train_0.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "model": {"arch": "QWEN3", "hf-card": hf_dir},
        "train": {"batch": 8, "learning-rate": 0.01, "dump-every": 50,
                  "warmup": 3, "gpt-every": 8,
                  "optimizatioin": {"method": "adamw"}},
        "datasets": {"train": {"glob": str(tmp_path / "p_train_*.bin"),
                               "name": "pattern"}},
        "debug": {"most_iter": 17},
        "seed": 42,
    }
    cfgp = str(tmp_path / "cfg.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[gpt@8]" in r.stdout and "[gpt@16]" in r.stdout, r.stdout[-1500:]


def test_koifish_fuyou_cli(tmp_path):
    """The `model.fuyou` config key changes the training run (swarm
    rotation logs + a different loss trajectory) — mirrors the
    reference's GPT2±fuyou golden pair (test_lite.py:107-131;
    ExploreOptimization hook gLLM.cpp:673-677)."""
    seq = (np.arange(40000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "p_train_0.bin"), seq, MAGIC_QWEN3, 300)
    base = {
        "model": {"arch": "QWEN3", "vocab_size": 300,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 64,
                                                "Ffn": 128, "Head": 4,
                                                "KVHead": 2, "head_dim": 16}}},
        "train": {"batch": 8, "learning-rate": 0.01, "dump-every": 50,
                  "warmup": 3,
                  "optimizatioin": {"method": "adamw", "grad_accumulation": 1}},
        "datasets": {"train": {"glob": str(tmp_path / "p_train_*.bin"),
                               "name": "pattern"}},
        "debug": {"most_iter": 24},
        "seed": 42,
    }
    losses = {}
    for tag in ("no_fuyou", "fuyou"):
        cfg = json.loads(json.dumps(base))
        if tag == "fuyou":
            cfg["model"]["fuyou"] = {"branch": 3, "switch": 8,
                                     "method": "pso_ga", "crossover": 0.6,
                                     "mutation": 0.001, "social": 2}
        out = tmp_path / tag
        out.mkdir()
        cfgp = str(out / "cfg.json")
        with open(cfgp, "w") as f:
            json.dump(cfg, f)
        r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(out))
        assert r.returncode == 0, r.stderr[-2000:]
        if tag == "fuyou":
            assert "[fuyou] iter" in r.stdout, r.stdout[-1500:]
        with open(out / "koifish_loss.csv") as f:
            rows = list(csv.DictReader(f))
        losses[tag] = [float(x["loss"]) for x in rows]
    # both trajectories train; fuyou's branch swaps make them diverge
    assert losses["no_fuyou"][-1] < losses["no_fuyou"][0]
    assert losses["fuyou"][-1] < losses["fuyou"][0]
    assert losses["fuyou"][10:] != losses["no_fuyou"][10:]


def test_bubble_chat_cli(tmp_path, tiny_hf):
    hf_dir, card = tiny_hf
    r = run_cli("bubble", "--hf", hf_dir, "--prompts", "hello",
                "--max-new", "8", "--bits", "8", "--kv-bits", "8",
                "--temperature", "0", "--ctx", "128", "--device", "cpu",
                "--csv", str(tmp_path / "chat.csv"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tk/s" in r.stdout
    with open(tmp_path / "chat.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows and rows[0]["prompt"] == "hello"


def test_bubble_kun_model_cli(tmp_path, tiny_hf):
    """A reference-format .kun single-file model chats through bubble
    (interop: Serialize.cpp:465-514 load path)."""
    import shutil
    hf_dir, card = tiny_hf
    from koifish_tpu.io.kun import write_kun
    from koifish_tpu.io.safetensors import read_safetensors
    import os
    tensors, _ = read_safetensors(os.path.join(hf_dir, "model.safetensors"))
    cfg = {"model": {"arch": "QWEN3", "vocab_size": card.vocab_size,
                     "parameter": {"Layer": card.n_layer,
                                   "tie_word_embeddings": True,
                                   "max_pos_embeddings": card.max_pos,
                                   "transformer": {
                                       "Ctx": card.n_ctx, "Embed": card.n_embd,
                                       "Head": card.n_head,
                                       "KVHead": card.n_kv_head,
                                       "head_dim": card.head_dim,
                                       "Ffn": card.n_ffn}}}}
    kun = tmp_path / "model.kun"
    write_kun(str(kun), cfg, dict(tensors))
    shutil.copy(os.path.join(hf_dir, "tokenizer.json"),
                tmp_path / "tokenizer.json")
    r = run_cli("bubble", "--hf", str(kun), "--prompts", "hello",
                "--max-new", "8", "--temperature", "0", "--ctx", "128",
                "--device", "cpu", "--csv", str(tmp_path / "chat.csv"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tk/s" in r.stdout


def test_pangpi_ppl_cli(tmp_path, tiny_hf):
    hf_dir, card = tiny_hf
    seq = np.random.default_rng(0).integers(0, 300, 20000).astype(np.uint32)
    write_shard(str(tmp_path / "val.bin"), seq, MAGIC_QWEN3, 300)
    r = run_cli("pangpi", "--hf", hf_dir, "--ppl", str(tmp_path / "val.bin"),
                "--max", "2", "--batch", "4", "--device", "cpu")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ppl=" in r.stdout


def test_koifish_missing_dataset_error(tmp_path):
    cfg = {"model": {"arch": "QWEN3", "vocab_size": 300,
                     "parameter": {"Layer": 1,
                                   "transformer": {"Ctx": 32, "Embed": 64,
                                                   "Ffn": 128, "Head": 4,
                                                   "KVHead": 2, "head_dim": 16}}},
           "train": {"batch": 2}}
    cfgp = str(tmp_path / "c.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu")
    assert r.returncode == 2
    assert "no train dataset" in r.stderr


def test_koifish_sft_jsonl_cli(tmp_path, tiny_hf):
    """SFT from an OAI-message JSONL with LoRA — qwen3_sft.json-style flow."""
    hf_dir, card = tiny_hf
    convs = []
    for i in range(64):
        convs.append({"messages": [
            {"role": "user", "content": f"hello {i}"},
            {"role": "assistant", "content": "hello hello hello"}]})
    jp = str(tmp_path / "chat.jsonl")
    with open(jp, "w") as f:
        for c in convs:
            f.write(json.dumps(c) + "\n")
    cfg = {
        "sft": {"hf-card": hf_dir, "method": "lora"},
        "model": {"arch": "QWEN3"},
        "train": {"batch": 4, "learning-rate": 0.01, "warmup": 2,
                  "dump-every": 5, "epoch": 2},
        "datasets": {"train": {"glob": jp, "type": "OAI_message"}},
        "debug": {"most_iter": 10},
        "seed": 42,
    }
    cfgp = str(tmp_path / "sft.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SFT method=lora" in r.stdout
    with open(tmp_path / "koifish_loss.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 10
    assert float(rows[-1]["loss"]) < float(rows[0]["loss"])


def test_koifish_qat_gama_cli(tmp_path):
    """Gama (scale-only) QAT from config quantizer card."""
    seq = (np.arange(30000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "q_train.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "quantizer": {"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                      "group_size": 32, "train_target": "gama"},
        "model": {"arch": "QWEN3", "vocab_size": 300,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 64,
                                                "Ffn": 128, "Head": 4,
                                                "KVHead": 2, "head_dim": 16}}},
        "train": {"batch": 8, "learning-rate": 0.003, "warmup": 2,
                  "dump-every": 5},
        "datasets": {"train": {"glob": str(tmp_path / "q_train.bin")}},
        "debug": {"most_iter": 12},
        "seed": 42,
    }
    cfgp = str(tmp_path / "qat.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "gama" in r.stdout


def test_pretokenize_cli(tmp_path, tiny_hf):
    """Offline text -> shard conversion roundtrip (PreTokenizer analog)."""
    hf_dir, card = tiny_hf
    with open(tmp_path / "doc1.txt", "w") as f:
        f.write("hello world hello\n" * 50)
    with open(tmp_path / "doc2.jsonl", "w") as f:
        for i in range(20):
            f.write(json.dumps({"text": f"hello {i}"}) + "\n")
    out = str(tmp_path / "shards")
    r = run_cli("pretokenize", "--hf", hf_dir,
                "--input", str(tmp_path / "doc*"), "--out", out,
                "--name", "toy", "--val-frac", "0")
    assert r.returncode == 0, r.stderr[-1500:]
    import glob as g
    shards = g.glob(out + "/toy_train_*.bin")
    assert shards
    from koifish_tpu.data import read_shard
    toks, _, info = read_shard(shards[0])
    assert info["count"] > 100
    # decodes back to text containing the corpus words
    from koifish_tpu.data import BPETokenizer
    tk = BPETokenizer.from_file(hf_dir)
    assert "hello" in tk.decode(np.asarray(toks[:50]).tolist())


def test_koifish_multichip_cli(tmp_path):
    """--dp/--tp mesh flags on the 8-device CPU backend."""
    seq = (np.arange(30000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "m_train.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "model": {"arch": "QWEN3", "vocab_size": 512,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 128,
                                                "Ffn": 256, "Head": 8,
                                                "KVHead": 4, "head_dim": 16}}},
        "train": {"batch": 8, "learning-rate": 0.01, "warmup": 3,
                  "dump-every": 5},
        "datasets": {"train": {"glob": str(tmp_path / "m_train.bin")}},
        "debug": {"most_iter": 10},
        "seed": 42,
    }
    cfgp = str(tmp_path / "m.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    env_extra = {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               **env_extra)
    r = subprocess.run(
        [sys.executable, "-m", "koifish_tpu.cli.koifish", cfgp,
         "--device", "cpu", "--out-dir", str(tmp_path),
         "--dp", "2", "--tp", "4", "--fsdp"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mesh dp=2 tp=4" in r.stdout
    with open(tmp_path / "koifish_loss.csv") as f:
        rows = list(csv.DictReader(f))
    assert float(rows[-1]["loss"]) < float(rows[0]["loss"])


def test_bubble_awq_model_cli(tmp_path):
    """Chat from a vendor-AWQ checkpoint (quantize-at-load import path) —
    the analog of the reference's AWQ inference golden (test_lite.py:36-53)."""
    from tests.helpers import make_hf_awq_qwen3_dir
    d = tmp_path / "awq"
    d.mkdir()
    card = ModelCard.from_arch("QWEN3", vocab_size=320, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=64, max_pos=256)
    make_hf_awq_qwen3_dir(d, card)
    r = run_cli("bubble", "--hf", str(d), "--prompts", "hello",
                "--max-new", "6", "--temperature", "0", "--ctx", "128",
                "--device", "cpu", "--csv", str(tmp_path / "chat.csv"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tk/s" in r.stdout


def test_koifish_resume_cli(tmp_path):
    """Train, checkpoint, resume — loss continues from where it left off."""
    seq = (np.arange(30000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "r_train.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "model": {"arch": "QWEN3", "vocab_size": 300,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 64,
                                                "Ffn": 128, "Head": 4,
                                                "KVHead": 2, "head_dim": 16}}},
        "train": {"batch": 8, "learning-rate": 0.01, "warmup": 3,
                  "dump-every": 5, "save-every": 100},
        "datasets": {"train": {"glob": str(tmp_path / "r_train.bin")}},
        "debug": {"most_iter": 15},
        "seed": 42,
    }
    cfgp = str(tmp_path / "r.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    import glob as g
    cks = g.glob(str(tmp_path / "koifish_final_*.safetensors"))
    assert cks
    with open(tmp_path / "koifish_loss.csv") as f:
        loss_before = float(list(csv.DictReader(f))[-1]["loss"])
    r2 = run_cli("koifish", cfgp, "--device", "cpu",
                 "--out-dir", str(tmp_path), "--resume", cks[0])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "resumed from" in r2.stdout and "step 15" in r2.stdout
    with open(tmp_path / "koifish_loss.csv") as f:
        rows = list(csv.DictReader(f))
    # resumed run starts near where the first left off, not from scratch
    assert float(rows[0]["loss"]) < loss_before + 1.0


def test_koifish_gpt2_uint16_shards_cli(tmp_path):
    """GPT2 training from uint16 (llm.c-style) shards end-to-end."""
    from koifish_tpu.data import MAGIC_GPT2
    seq = (np.arange(40000) % 64).astype(np.uint16)
    write_shard(str(tmp_path / "g_train.bin"), seq, MAGIC_GPT2, 50257)
    cfg = {
        "model": {"arch": "GPT2", "vocab_size": 128,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 32, "Embed": 64,
                                                "Head": 4, "Ffn": 256}}},
        "train": {"batch": 8, "learning-rate": 0.01, "warmup": 3,
                  "dump-every": 5},
        "datasets": {"train": {"glob": str(tmp_path / "g_train.bin")}},
        "debug": {"most_iter": 20},
        "seed": 42,
    }
    cfgp = str(tmp_path / "g.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "koifish_loss.csv") as f:
        rows = list(csv.DictReader(f))
    assert float(rows[-1]["loss"]) < float(rows[0]["loss"]) * 0.7


def test_bubble_tp_cli(tmp_path, tiny_hf):
    """bubble --tp 2 on the virtual CPU mesh (TP-sharded decode)."""
    hf_dir, card = tiny_hf
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "koifish_tpu.cli.bubble", "--hf", hf_dir,
         "--prompts", "hello", "--max-new", "6", "--temperature", "0",
         "--ctx", "128", "--device", "cpu", "--tp", "2",
         "--csv", str(tmp_path / "chat.csv")],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tensor-parallel over 2" in r.stdout
    assert "tk/s" in r.stdout


def test_bubble_speculative_cli(tmp_path, tiny_hf):
    """bubble --draft-hf: self-draft speculative chat must match the plain
    greedy chat answer exactly (lossless guarantee, serve/speculative)."""
    hf_dir, card = tiny_hf
    base = run_cli("bubble", "--hf", hf_dir, "--prompts", "hello",
                   "--max-new", "8", "--temperature", "0", "--ctx", "128",
                   "--device", "cpu", "--csv", str(tmp_path / "a.csv"))
    assert base.returncode == 0, base.stderr[-2000:]
    spec = run_cli("bubble", "--hf", hf_dir, "--draft-hf", hf_dir,
                   "--draft-k", "3", "--prompts", "hello",
                   "--max-new", "8", "--temperature", "0", "--ctx", "128",
                   "--device", "cpu", "--csv", str(tmp_path / "b.csv"))
    assert spec.returncode == 0, spec.stderr[-2000:]
    assert "accept_rate" in spec.stdout
    a = list(csv.DictReader(open(tmp_path / "a.csv")))[0]["answer"]
    b = list(csv.DictReader(open(tmp_path / "b.csv")))[0]["answer"]
    assert a == b, (a, b)


def test_koifish_sp_cli(tmp_path):
    """--sp: sequence-parallel (ring attention) training via the CLI."""
    seq = (np.arange(30000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "s_train.bin"), seq, MAGIC_QWEN3, 300)
    cfg = {
        "model": {"arch": "QWEN3", "vocab_size": 512,
                  "parameter": {"Layer": 2,
                                "transformer": {"Ctx": 64, "Embed": 128,
                                                "Ffn": 256, "Head": 8,
                                                "KVHead": 4, "head_dim": 16}}},
        "train": {"batch": 4, "learning-rate": 0.01, "warmup": 3,
                  "dump-every": 5, "remat": False},
        "datasets": {"train": {"glob": str(tmp_path / "s_train.bin")}},
        "debug": {"most_iter": 8},
        "seed": 42,
    }
    cfgp = str(tmp_path / "s.json")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "koifish_tpu.cli.koifish", cfgp,
         "--device", "cpu", "--out-dir", str(tmp_path), "--sp", "2"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sp=2" in r.stdout
    with open(tmp_path / "koifish_loss.csv") as f:
        rows = list(csv.DictReader(f))
    assert float(rows[-1]["loss"]) < float(rows[0]["loss"])


def test_koifish_guppy_and_llama_vae_cli(tmp_path):
    """The two round-4 archs train through the product surface: a
    reference-style JSON config with arch GUPPY (vocab-memory FFN) and
    arch LLAMA_VAE (token_embeds latent list) -> koifish -> loss falls."""
    seq = (np.arange(40000) % 64).astype(np.uint32)
    write_shard(str(tmp_path / "p_train_0.bin"), seq, MAGIC_QWEN3, 300)
    for arch, extra_p in [("GUPPY", {}),
                          ("LLAMA_VAE", {"token_embeds": [24]})]:
        cfg = {
            "model": {"arch": arch, "vocab_size": 300,
                      "parameter": dict(
                          {"Layer": 2,
                           "transformer": {"Ctx": 32, "Embed": 64,
                                           "Ffn": 96, "Head": 4,
                                           "KVHead": 4, "head_dim": 16}},
                          **extra_p)},
            "train": {"batch": 8, "learning-rate": 0.02, "dump-every": 5,
                      "warmup": 3,
                      "optimizatioin": {"method": "adamw",
                                        "grad_accumulation": 1}},
            "datasets": {"train": {"glob": str(tmp_path / "p_train_*.bin"),
                                   "name": "pattern"}},
            "debug": {"most_iter": 30},
            "seed": 42,
        }
        cfgp = str(tmp_path / f"cfg_{arch}.json")
        with open(cfgp, "w") as f:
            json.dump(cfg, f)
        out = str(tmp_path / arch)
        os.makedirs(out, exist_ok=True)
        r = run_cli("koifish", cfgp, "--device", "cpu", "--out-dir", out)
        assert r.returncode == 0, (arch, r.stderr[-2000:])
        with open(os.path.join(out, "koifish_loss.csv")) as f:
            rows = list(csv.DictReader(f))
        first, last = float(rows[0]["loss"]), float(rows[-1]["loss"])
        assert last < first * 0.6, (arch, first, last)


def test_bubble_tp_streamed_quantized_cli(tmp_path, tiny_hf):
    """bubble --tp 2 --bits 4: the big-model path — streamed sharded
    quantize-at-load (io/stream_load) instead of load-then-quantize.
    Greedy answer must match the plain single-device chat."""
    hf_dir, card = tiny_hf
    import subprocess
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    base = run_cli("bubble", "--hf", hf_dir, "--prompts", "hello",
                   "--max-new", "6", "--temperature", "0", "--ctx", "128",
                   "--device", "cpu", "--csv", str(tmp_path / "a.csv"))
    assert base.returncode == 0, base.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "koifish_tpu.cli.bubble", "--hf", hf_dir,
         "--prompts", "hello", "--max-new", "6", "--temperature", "0",
         "--ctx", "128", "--device", "cpu", "--tp", "2", "--bits", "4",
         "--csv", str(tmp_path / "b.csv")],
        capture_output=True, text=True, timeout=240, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "streamed sharded quantize-at-load" in r.stdout, r.stdout[-1000:]
    a = list(csv.DictReader(open(tmp_path / "a.csv")))[0]["answer"]
    b = list(csv.DictReader(open(tmp_path / "b.csv")))[0]["answer"]
    # tiny dims (E=64 < group 128) keep weights bf16 on both paths, so
    # greedy decode must agree EXACTLY
    assert a == b, (a, b)
