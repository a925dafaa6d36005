"""Model forward correctness: shapes, arch variants, quantize-at-load
parity, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koifish_tpu.config import CLIParams, ModelCard, QuantCard
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.quant.apply import quantize_params


def tiny_card(arch="QWEN3", **kw):
    base = dict(vocab_size=512, n_layer=2, n_embd=128, n_head=4, n_kv_head=2,
                head_dim=32, n_ffn=256, n_ctx=64, max_pos=128)
    if arch == "GPT2":
        base.update(n_kv_head=4)
    base.update(kw)
    return ModelCard.from_arch(arch, **base)


@pytest.mark.parametrize("arch", ["QWEN3", "QWEN2", "GPT2", "LLAMA"])
def test_forward_shapes(arch):
    card = tiny_card(arch)
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, card.vocab_size)
    logits = jax.jit(lambda p, t: model_forward(card, p, t))(params, tokens)
    assert logits.shape == (2, 16, card.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_forward_causality():
    """Changing a future token must not change past logits."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    t1 = jnp.zeros((1, 16), jnp.int32)
    t2 = t1.at[0, 10].set(7)
    l1 = model_forward(card, params, t1)
    l2 = model_forward(card, params, t2)
    np.testing.assert_allclose(np.asarray(l1[0, :10]), np.asarray(l2[0, :10]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, 10]), np.asarray(l2[0, 10]))


def test_quantize_at_load_close():
    """INT8-quantized model must track the bf16 model closely (the analog of
    the reference's quant-error invariant, GeQuant.cpp:888-897)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    qcard = QuantCard.from_json({"self_attn": {"bits": 8}, "mlp": {"bits": 8},
                                 "group_size": 64})
    qparams = quantize_params(params, qcard)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, card.vocab_size)
    lf = model_forward(card, params, tokens)
    lq = model_forward(card, qparams, tokens)
    # logit agreement in probability space
    pf = jax.nn.softmax(lf, axis=-1)
    pq = jax.nn.softmax(lq, axis=-1)
    assert float(jnp.abs(pf - pq).max()) < 0.05


def test_quantized_embed_head():
    card = tiny_card(n_embd=128)
    params = init_params(card, jax.random.PRNGKey(0))
    qcard = QuantCard.from_json({"embed_tokens": {"bits": 8}, "group_size": 64})
    qparams = quantize_params(params, qcard)
    from koifish_tpu.quant.qtensor import QTensor
    assert isinstance(qparams["wte"], QTensor)
    assert qparams["wte"].shape == (card.n_embd, card.vocab_size)
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    lf = model_forward(card, params, tokens)
    lq = model_forward(card, qparams, tokens)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    assert float(jnp.abs(pf - pq).max()) < 0.05


def test_config_port_reference_json():
    """A reference-style config JSON parses into the right ModelCard."""
    raw = {
        "quantizer": {"self_attn": {"quant_method": "RTN", "bits": 4},
                      "mlp": {"quant_method": "RTN", "bits": 4},
                      "group_size": 128},
        "model": {
            "arch": "QWEN3",
            "parameter": {
                "Layer": 6,
                "transformer": {"Ctx": 1024, "Embed": 1024, "Ffn": 3072,
                                "Head": 16, "KVHead": 8, "head_dim": 128},
                "tie_word_embeddings": True,
                "max_pos_embeddings": 32768,
            },
        },
        "train": {"batch": 16, "learning-rate": 0.0006,
                  "optimizatioin": {"method": "adamw", "grad_accumulation": 1}},
        "seed": 42,
    }
    p = CLIParams.from_json(raw)
    assert p.model.arch == "QWEN3" and p.model.n_layer == 6
    assert p.model.n_head == 16 and p.model.n_kv_head == 8
    assert p.model.head_dim == 128 and p.model.qk_norm
    assert p.train.lr == 0.0006 and p.train.batch == 16
    assert len(p.quant.rules) == 2
    from koifish_tpu.dtypes import QFormat
    assert p.quant.rule_for("model.layers.0.self_attn.q_proj").fmt == QFormat.INT4


def test_mla_deepseek_forward_and_decode():
    """DeepSeek-style MLA: forward shapes, causality, decode==forward."""
    from koifish_tpu.serve import cache_for, prefill, decode_step
    card = ModelCard.from_arch(
        "DEEPSEEK", vocab_size=256, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=4, n_ffn=128, n_ctx=32, max_pos=64)
    card.attn = "mla"
    card.q_lora_rank = 24
    card.kv_lora_rank = 32
    card.qk_nope_head_dim = 16
    card.qk_rope_head_dim = 8
    card.v_head_dim = 16
    card.head_dim = 24
    params = init_params(card, jax.random.PRNGKey(0))
    assert "wkv_a" in params["layers"][0] and "wq_a" in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 256)
    full = model_forward(card, params, tokens)
    assert full.shape == (2, 10, 256)
    assert bool(jnp.isfinite(full).all())

    # incremental decode parity
    import numpy as np
    cache = cache_for(card, 2, 32)
    assert cache.v.shape[-1] == 16 and cache.k.shape[-1] == 24
    logits, cache = prefill(card, params, tokens[:, :1], cache)
    outs = [logits]
    for t in range(1, 10):
        logits, cache = decode_step(card, params, tokens[:, t], cache)
        outs.append(logits)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_mla_trains():
    from koifish_tpu.train.trainer import init_train_state, make_train_step
    from koifish_tpu.config import TrainCard
    card = ModelCard.from_arch(
        "DEEPSEEK", vocab_size=128, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=4, n_ffn=128, n_ctx=32, max_pos=64)
    card.attn = "mla"
    card.q_lora_rank = 0         # direct q projection variant
    card.kv_lora_rank = 32
    card.qk_nope_head_dim = 16
    card.qk_rope_head_dim = 8
    card.v_head_dim = 16
    card.head_dim = 24
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7


def test_mamba_forward_causal_and_trains():
    """Mamba SSM: shapes, causality, loss drops (the reference's LLM_MAMBA
    is a non-functional stub — this is a working selective SSM)."""
    card = ModelCard.from_arch("MAMBA", vocab_size=128, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=4, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    assert "in_proj" in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    logits = model_forward(card, params, tokens)
    assert logits.shape == (2, 16, 128)
    assert bool(jnp.isfinite(logits).all())

    # causality: future token must not affect past logits
    t2 = tokens.at[0, 10].set((tokens[0, 10] + 1) % 128)
    l1 = model_forward(card, params, tokens)
    l2 = model_forward(card, params, t2)
    np.testing.assert_allclose(np.asarray(l1[0, :10]), np.asarray(l2[0, :10]),
                               rtol=1e-4, atol=1e-4)

    # trains on the +1 pattern
    from koifish_tpu.config import TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_embed_vae_compresses():
    """EmbedVAE learns to reconstruct a low-rank embedding table."""
    from koifish_tpu.models.embed_vae import (
        train_embed_vae, reconstruction_loss, compress_embeddings,
        init_embed_vae)
    key = jax.random.PRNGKey(0)
    # low-rank table: [512, 64] = U[512,16] @ V[16,64]
    U = jax.random.normal(key, (512, 16))
    Vm = jax.random.normal(jax.random.PRNGKey(1), (16, 64))
    wte = U @ Vm / 4.0
    vae, losses = train_embed_vae(wte, dims=[64, 32, 16], steps=300, lr=3e-3)
    assert losses[-1] < losses[0] * 0.3
    z = compress_embeddings(wte, vae)
    assert z.shape == (512, 16)


def test_prefill_chunked_matches_single():
    from koifish_tpu.serve import init_cache
    from koifish_tpu.serve.engine import prefill, prefill_chunked
    card = tiny_card(arch="QWEN3", n_ctx=64, max_pos=128)
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 23), 0,
                                card.vocab_size)
    c1 = init_cache(card.n_layer, 2, 64, card.n_kv_head, card.head_dim)
    c2 = init_cache(card.n_layer, 2, 64, card.n_kv_head, card.head_dim)
    l1, c1 = prefill(card, params, tokens, c1)
    l2, c2 = prefill_chunked(card, params, tokens, c2, chunk=8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-2, atol=2e-2)
    assert int(c2.pos[0]) == 23


def test_hotpicker_context_sparsity():
    """HotPicker: slicing FFNs to hot neurons keeps outputs close on the
    calibration distribution (HotPicker/CS_Picker analog)."""
    from koifish_tpu.models.hotpick import ffn_activation_energy, pick_hot
    card = tiny_card(n_ffn=512)
    params = init_params(card, jax.random.PRNGKey(0))
    calib = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                               card.vocab_size)
    energies = ffn_activation_energy(card, params, calib)
    assert len(energies) == card.n_layer and energies[0].shape == (512,)
    new_card, new_params = pick_hot(card, params, energies, keep=0.5)
    assert new_card.n_ffn == 256
    assert new_params["layers"][0]["gate"].shape == (card.n_embd, 256)
    lf = model_forward(card, params, calib)
    lh = model_forward(new_card, new_params, calib)
    pf = jax.nn.softmax(lf, -1)
    ph = jax.nn.softmax(lh, -1)
    # hot half retains most of the distribution (random init -> loose)
    assert float(jnp.abs(pf - ph).max()) < 0.2


def test_hotpicker_composes_with_quantization():
    """pick_hot on INT4-quantized FFNs: gate/up slice packed codes
    directly (out axis), down requantizes after row slicing — the two
    flagship features compose (VERDICT r1 weak #9)."""
    from koifish_tpu.models.hotpick import ffn_activation_energy, pick_hot
    from koifish_tpu.config import QuantCard
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.quant.qtensor import QTensor
    card = tiny_card(n_ffn=512)
    params = init_params(card, jax.random.PRNGKey(0))
    qc = QuantCard.from_json({"mlp": {"bits": 4}, "group_size": 32})
    qparams = quantize_params(params, qc, card)
    assert isinstance(qparams["layers"][0]["gate"], QTensor)
    calib = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                               card.vocab_size)
    energies = ffn_activation_energy(card, qparams, calib)
    new_card, new_params = pick_hot(card, qparams, energies, keep=0.5)
    assert new_card.n_ffn == 256
    g = new_params["layers"][0]["gate"]
    assert isinstance(g, QTensor) and g.shape == (card.n_embd, 256)
    d = new_params["layers"][0]["down"]
    assert isinstance(d, QTensor) and d.shape == (256, card.n_embd)
    # sliced quantized model still runs and stays close to the sliced
    # bf16 model (quant error on top of slicing error -> loose tol)
    lq = model_forward(new_card, new_params, calib)
    e2 = ffn_activation_energy(card, params, calib)
    _, dense_sliced = pick_hot(card, params, e2, keep=0.5)
    ld = model_forward(new_card, dense_sliced, calib)
    assert float(jnp.abs(jax.nn.softmax(lq, -1)
                         - jax.nn.softmax(ld, -1)).max()) < 0.3


def test_mla_latent_cache_matches_standard():
    """Absorbed latent-cache MLA decode == the standard materialized-KV
    path (DeepSeek serving memory optimization: cache rkv+dr per token
    instead of H*(dn+dr+dv))."""
    from koifish_tpu.serve import cache_for, prefill, decode_step
    from koifish_tpu.serve.mla_cache import (
        mla_cache_for, mla_prefill, mla_decode_step)
    card = ModelCard.from_arch(
        "DEEPSEEK", vocab_size=256, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=4, n_ffn=128, n_ctx=32, max_pos=64)
    card.attn = "mla"
    card.q_lora_rank = 24
    card.kv_lora_rank = 32
    card.qk_nope_head_dim = 16
    card.qk_rope_head_dim = 8
    card.v_head_dim = 16
    card.head_dim = 24
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 256)

    c_std = cache_for(card, 2, 32)
    l_std, c_std = prefill(card, params, tokens, c_std)
    c_lat = mla_cache_for(card, 2, 32)
    l_lat, c_lat = mla_prefill(card, params, tokens, c_lat)
    np.testing.assert_allclose(np.asarray(l_std), np.asarray(l_lat),
                               rtol=2e-2, atol=2e-2)
    # latent cache really is smaller per token
    per_tok_lat = c_lat.c_kv.shape[-1] + c_lat.k_rope.shape[-1]
    per_tok_std = card.n_kv_head * (card.head_dim + card.v_head_dim)
    assert per_tok_lat < per_tok_std

    for t in range(3):
        tok = jnp.full((2,), 9 + t, jnp.int32)
        l_std, c_std = decode_step(card, params, tok, c_std)
        l_lat, c_lat = mla_decode_step(card, params, tok, c_lat)
        np.testing.assert_allclose(np.asarray(l_std), np.asarray(l_lat),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("remat", [True, "dots", False])
def test_remat_variants_match(remat):
    """remat policies (full / dots-saveable / off) must produce the same
    grads — only memory/recompute scheduling differs (transformer.py
    model_forward; reference remater_ffn QKV.cu:770)."""
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                              card.vocab_size, dtype=jnp.int32)

    def loss(p):
        lg = model_forward(card, p, toks, remat=remat)
        return (lg.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss)(params)
    g_ref = jax.grad(lambda p: (model_forward(card, p, toks)
                                .astype(jnp.float32) ** 2).mean())(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=1e-5)


def test_mla_generate_layered_path():
    """MLA (K dim != V dim) must flow through generate()'s per-layer
    cache path (qkv_project handles the MLA projections; the V-dim split
    rides cache_for's v_head_dim)."""
    from koifish_tpu.config import SamplerCard
    from koifish_tpu.serve import cache_for, generate
    card = ModelCard.from_arch(
        "DEEPSEEK", vocab_size=256, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=4, n_ffn=128, n_ctx=32, max_pos=64)
    card.attn = "mla"
    card.q_lora_rank = 24
    card.kv_lora_rank = 32
    card.qk_nope_head_dim = 16
    card.qk_rope_head_dim = 8
    card.v_head_dim = 16
    card.head_dim = 24
    params = init_params(card, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 256)
    cache = cache_for(card, 2, 32)
    toks, _ = generate(card, params, prompt, cache,
                       SamplerCard(temperature=0.0), max_new_tokens=6,
                       decode_chunk=3)
    assert np.asarray(toks).shape == (2, 6)


@pytest.mark.parametrize("fname,arch,layers,embd", [
    ("gpt2_124M.json", "GPT2", 12, 768),
    ("gpt2_774M.json", "GPT2", 36, 1280),
    ("gpt2_1558M.json", "GPT2", 48, 1600),
    ("qwen25_0.5B.json", "QWEN2", 24, 896),
    ("qwen3_0.6B.json", "QWEN3", 28, 1024),
    ("qwen3_4B.json", "QWEN3", 36, 2560),
    ("qwen3_596M_q4.json", "QWEN3", 6, 1024),
    ("qwen3_sft.json", "QWEN3", 28, 1024),
])
def test_real_reference_configs_parse(fname, arch, layers, embd):
    """Every shipping reference case config must load through CLIParams
    with the right model dims (the config schema IS the product surface,
    reference README.md:26)."""
    import os
    base = "/root/reference/cases"
    path = os.path.join(base, fname)
    if not os.path.exists(path):
        path = os.path.join(base, "qwen3", fname)
    if not os.path.exists(path):
        pytest.skip("reference cases not mounted")
    p = CLIParams.load(path)
    assert p.model.arch == arch
    assert p.model.n_layer == layers
    assert p.model.n_embd == embd


def test_repo_configs_parse():
    """Every shipped config under configs/ parses into consistent cards
    (the tuned big-model configs carry the sweep-measured train flags)."""
    import glob
    import json as _json

    from koifish_tpu.config import CLIParams
    paths = sorted(glob.glob("configs/*.json"))
    assert len(paths) >= 5, paths
    for p in paths:
        cp = CLIParams.from_json(_json.load(open(p)))
        assert cp.model.n_layer > 0 and cp.model.vocab_size > 0, p
        assert cp.train.batch > 0, p
    big = CLIParams.from_json(_json.load(open("configs/gpt2_1558m.json")))
    assert big.train.remat is True and big.train.int8_matmul
    assert big.train.moment_dtype == "bf16"
    assert big.train.int8_min_kn == 4 << 20


def test_guppy_trains_and_generates():
    """GUPPY (reference gLLM.hpp:231): vocab-memory FFN over per-step
    resampled embedding rows — trains on the +1 pattern, and serving with
    the deterministic seed-0 sample continues the pattern."""
    card = ModelCard.from_arch("GUPPY", vocab_size=64, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=4, head_dim=16, n_ffn=96,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    assert "guppy_gain" in params["layers"][0]
    assert "gate" not in params["layers"][0] and "fc" not in params["layers"][0]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    logits = model_forward(card, params, tokens)
    assert logits.shape == (2, 16, 64)
    assert bool(jnp.isfinite(logits).all())

    from koifish_tpu.config import TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step
    tcard = TrainCard(batch=8, lr=0.02, warmup=3, dump_every=100)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=60)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(60):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # deterministic serving: greedy decode continues the +1 pattern
    from koifish_tpu.config import SamplerCard
    from koifish_tpu.serve import generate, init_cache
    cache = init_cache(card.n_layer, 1, 32, card.n_kv_head, card.head_dim)
    prompt = (jnp.arange(8)[None] + 3).astype(jnp.int32) % 64
    toks, _ = generate(card, state.params, prompt, cache,
                       sampler=SamplerCard(temperature=0.0),
                       max_new_tokens=6)
    got = [int(t) for t in jnp.asarray(toks)[0]]
    want = [(11 + i) % 64 for i in range(6)]
    assert got == want, (got, want)


def test_llama_vae_trains():
    """LLAMA_VAE (reference gLLM.hpp:163): token embeddings factored
    through the EmbedVAE latent stack, trained end-to-end."""
    card = ModelCard.from_arch("LLAMA_VAE", vocab_size=64, n_layer=2,
                               n_embd=64, n_head=4, n_kv_head=4, head_dim=16,
                               n_ffn=128, n_ctx=32, max_pos=64,
                               token_embeds=(24,))
    params = init_params(card, jax.random.PRNGKey(0))
    assert "evae" in params
    assert params["evae"]["enc"][0]["w"].shape == (64, 24)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    logits = model_forward(card, params, tokens)
    assert logits.shape == (2, 16, 64)

    from koifish_tpu.config import TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=40)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])


def test_guppy_serves_via_stacked_and_batch_paths():
    """Regression: GUPPY row injection must happen in the serve entry
    points themselves (prefill/decode_step/layered), not only inside
    generate() — caller-stacked decode params (the bubble.py pattern)
    previously hit KeyError('guppy_rows')."""
    from koifish_tpu.config import SamplerCard
    from koifish_tpu.serve import generate, init_cache
    from koifish_tpu.serve.stacked import stack_layers
    card = ModelCard.from_arch("GUPPY", vocab_size=64, n_layer=2, n_embd=64,
                               n_head=4, n_kv_head=4, head_dim=16, n_ffn=96,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    sparams = stack_layers(params)
    assert sparams is not None
    cache = init_cache(card.n_layer, 1, 32, card.n_kv_head, card.head_dim)
    prompt = (jnp.arange(8)[None] + 3).astype(jnp.int32) % 64
    toks, _ = generate(card, params, prompt, cache,
                       sampler=SamplerCard(temperature=0.0),
                       max_new_tokens=4, decode_params=sparams)
    assert toks.shape == (1, 4)
    assert bool(jnp.all((toks >= 0) & (toks < 64)))
