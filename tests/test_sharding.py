"""Multi-device sharding on the 8-device virtual CPU mesh: TP/FSDP param
layouts, sharded train step parity with single-device, sharded decode."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.models import init_params, model_forward
from koifish_tpu.parallel import make_mesh, mesh_shape_for, param_specs
from koifish_tpu.train.sharded import shard_batch, shard_train_state
from koifish_tpu.train.trainer import init_train_state, make_train_step


def tiny_card():
    return ModelCard.from_arch(
        "QWEN3", vocab_size=512, n_layer=2, n_embd=128, n_head=8, n_kv_head=4,
        head_dim=16, n_ffn=256, n_ctx=64, max_pos=128)


def test_mesh_shape():
    assert mesh_shape_for(8) == {"dp": 2, "tp": 4}  # dp>=2: exercises grad psum
    assert mesh_shape_for(8, tp=4) == {"dp": 2, "tp": 4}
    assert mesh_shape_for(1) == {"dp": 1, "tp": 1}


def test_param_specs_tp():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    specs = param_specs(params)
    lp = specs["layers"][0]
    assert lp["q"] == P(None, "tp")      # column parallel
    assert lp["o"] == P("tp", None)      # row parallel
    assert lp["down"] == P("tp", None)
    assert lp["ln1"] == P(None)
    assert specs["wte"] == P("tp", None)  # vocab sharded


def test_sharded_forward_matches_single():
    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 512)
    ref = model_forward(card, params, tokens)

    mesh = make_mesh({"dp": 2, "tp": 4})
    from koifish_tpu.parallel import shard_params
    sp = shard_params(params, mesh)
    out = jax.jit(lambda p, t: model_forward(card, p, t))(sp, tokens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-2, atol=2e-2)


def test_sharded_train_step_matches_single():
    """One TP+FSDP sharded train step == single-device step (numerics)."""
    card = tiny_card()
    tcard = TrainCard(batch=8, lr=1e-3, warmup=0, optimizer="adamw",
                      remat=False)
    step = make_train_step(card, tcard, total_steps=10)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 8, 33), 0, 512)
    batch = {"tokens": tokens}

    s0 = init_train_state(card, tcard)
    s_ref, m_ref = step(s0, batch)

    mesh = make_mesh({"dp": 2, "tp": 4})
    s1 = init_train_state(card, tcard)
    s1 = shard_train_state(s1, mesh, tp="tp", fsdp="dp")
    sb = shard_batch(batch, mesh)
    s_sh, m_sh = step(s1, sb)

    assert abs(float(m_ref["loss"]) - float(m_sh["loss"])) < 1e-3
    # spot-check a param leaf after update
    a = np.asarray(s_ref.params["layers"][0]["q"], dtype=np.float32)
    b = np.asarray(s_sh.params["layers"][0]["q"], dtype=np.float32)
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)


def test_graft_entry_single_and_multi():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    # entry(): compile-check on a smaller stand-in is covered by model tests;
    # here just check it builds abstract shapes quickly via eval_shape
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 128, 151936)

    ge.dryrun_multichip(8)


def test_ring_attention_matches_full():
    """Sequence-parallel ring attention over 8 devices == full attention."""
    import jax.numpy as jnp
    from koifish_tpu.ops.attention import causal_attention
    from koifish_tpu.parallel.ring_attention import ring_attention_sharded

    mesh = make_mesh({"sp": 8})
    B, T, Hq, Hkv, D = 2, 64, 4, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hkv, D), jnp.float32)
    ref = causal_attention(q, k, v, backend="ref")
    fn = jax.jit(ring_attention_sharded(mesh, "sp"))
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_decode_matches_single():
    """Tensor-parallel decode (weights column/row-parallel, KV cache
    head-sharded) == single-device decode — BASELINE configs 4/5
    groundwork (multi-chip Qwen3 serving)."""
    import jax.numpy as jnp
    from koifish_tpu.config import QuantCard
    from koifish_tpu.parallel import shard_params
    from koifish_tpu.parallel.sharding import shard_cache
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.serve import cache_for, prefill, decode_step

    card = tiny_card()   # n_kv_head=4 — divisible by tp=4
    params = init_params(card, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 512)

    # single-device reference
    c0 = cache_for(card, 2, 32)
    l0, c0 = prefill(card, params, tokens, c0)
    outs0 = [l0]
    for t in range(3):
        l0, c0 = decode_step(card, params, jnp.full((2,), t + 7, jnp.int32), c0)
        outs0.append(l0)

    mesh = make_mesh({"tp": 4})
    sp = shard_params(params, mesh)
    c1 = shard_cache(cache_for(card, 2, 32), mesh)
    jit_prefill = jax.jit(prefill, static_argnames=("card",))
    jit_decode = jax.jit(decode_step, static_argnames=("card",))
    l1, c1 = jit_prefill(card, sp, tokens, c1)
    outs1 = [l1]
    for t in range(3):
        l1, c1 = jit_decode(card, sp, jnp.full((2,), t + 7, jnp.int32), c1)
        outs1.append(l1)
    for a, b in zip(outs0, outs1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)

    # quantized variant: int4 weights TP-sharded (QTensor leaves shard too)
    qc = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                              "group_size": 16})
    qp = quantize_params(params, qc)
    c2 = cache_for(card, 2, 32)
    l2, _ = jit_prefill(card, qp, tokens, c2)
    sqp = shard_params(qp, mesh)
    c3 = shard_cache(cache_for(card, 2, 32), mesh)
    l3, _ = jit_prefill(card, sqp, tokens, c3)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l3),
                               rtol=2e-2, atol=2e-2)


def test_sequence_parallel_training_matches():
    """Ring attention wired into the TRAIN step (SPPolicy handed to
    make_train_step, koifish --sp): loss curve matches single-device to
    bf16 tolerance."""
    import numpy as np
    from jax.sharding import Mesh
    from koifish_tpu.ops.tracectx import SPPolicy
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    card = ModelCard.from_arch(
        "QWEN3", vocab_size=128, n_layer=2, n_embd=64, n_head=4,
        n_kv_head=2, head_dim=16, n_ffn=128, n_ctx=64, max_pos=64)
    tcard = TrainCard(batch=4, lr=0.01, warmup=3, seed=42, remat=False)

    def run(sp):
        policy = (SPPolicy("sp", Mesh(np.array(jax.devices()[:2]), ("sp",)))
                  if sp else None)
        state = init_train_state(card, tcard)
        step = make_train_step(card, tcard, total_steps=10, sp=policy)
        key = jax.random.PRNGKey(0)
        out = []
        for _ in range(4):
            key, k = jax.random.split(key)
            s = jax.random.randint(k, (4, 1), 0, 64)
            batch = {"tokens": ((s + jnp.arange(65)[None]) % 64)[None
                     ].astype(jnp.int32)}
            state, m = step(state, batch)
            out.append(float(m["loss"]))
        return out

    base, sp = run(False), run(True)
    assert max(abs(a - b) / a for a, b in zip(base, sp)) < 0.01


def test_shard_params_preserves_codebook_and_row_scale():
    """shard_params / the streaming loader must carry learned codebooks
    (k-means/MINI) and Sinkhorn row factors through device_put — before
    round 5 both were silently DROPPED, so a sharded cluster-quantized
    model dequantized with the global NF constants (45-89% error)."""
    from koifish_tpu.parallel import shard_params
    from koifish_tpu.quant.cluster import quantize_kmeans, quantize_sinkhorn
    from koifish_tpu.dtypes import QFormat

    card = tiny_card()
    params = init_params(card, jax.random.PRNGKey(0))
    lp = params["layers"][0]
    w_q = lp["q"].astype(jnp.float32)
    w_o = lp["o"].astype(jnp.float32)
    lp["q"] = quantize_kmeans(w_q, bits=4, group=16)
    lp["o"] = quantize_sinkhorn(w_o, QFormat.INT4, group=16)
    mesh = make_mesh({"tp": 4})
    sp = shard_params(params, mesh)
    sq, so = sp["layers"][0]["q"], sp["layers"][0]["o"]
    assert sq.codebook is not None and so.row_scale is not None
    np.testing.assert_allclose(
        np.asarray(sq.dequantize(jnp.float32)).reshape(w_q.shape),
        np.asarray(lp["q"].dequantize(jnp.float32)).reshape(w_q.shape))
    np.testing.assert_allclose(
        np.asarray(so.dequantize(jnp.float32)).reshape(w_o.shape),
        np.asarray(lp["o"].dequantize(jnp.float32)).reshape(w_o.shape))
