"""Quantization correctness: pack/unpack round-trip, RTN error bounds,
format sweep — the analog of the reference's GPU-vs-CPU quant cross-check
(errGPU < 1e-3, src/Tensor/GeQuant.cpp:888-897)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koifish_tpu.dtypes import QFormat
from koifish_tpu.quant import (
    QTensor, fake_quant, pack_codes, quant_error, quantize, quantize_best,
    unpack_codes,
)

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("fmt", [QFormat.INT4, QFormat.INT2, QFormat.TERNARY,
                                 QFormat.BINARY, QFormat.NF4, QFormat.NF3,
                                 QFormat.INT3])
def test_pack_roundtrip(fmt):
    n, m = 256, 64
    maxcode = (1 << fmt.pack_bits) - 1
    codes = jax.random.randint(KEY, (n, m), 0, maxcode + 1, dtype=jnp.int32)
    codes = codes.astype(jnp.uint8)
    packed = pack_codes(codes, fmt)
    assert packed.shape == (n // fmt.codes_per_byte, m)
    out = unpack_codes(packed, fmt, n)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


# expected relative-error ceilings for Gaussian weights (reference observes
# 6.3–15.8% for 4-bit RTN, GeQuant.cpp:885; target T_errQ=0.3)
_ERR_BOUND = {
    QFormat.INT8: 0.01,
    QFormat.INT4: 0.12,
    QFormat.NF4: 0.10,
    QFormat.INT3: 0.30,
    QFormat.NF3: 0.22,
    QFormat.INT2: 0.55,
    QFormat.TERNARY: 0.60,
    QFormat.BINARY: 0.85,
}


@pytest.mark.parametrize("fmt", list(_ERR_BOUND))
def test_rtn_error(fmt):
    w = jax.random.normal(KEY, (512, 256), dtype=jnp.float32)
    qt = quantize(w, fmt, group=128)
    err = float(quant_error(w, qt))
    assert err < _ERR_BOUND[fmt], f"{fmt}: err {err}"
    # memory: packed codes really are sub-byte
    bits_per_w = qt.nbytes() * 8 / w.size
    assert bits_per_w < fmt.pack_bits + 1.1 if fmt.is_sub_byte else True


def test_int8_asymmetric():
    w = jax.random.normal(KEY, (256, 128)) + 3.0  # shifted distribution
    sym = quantize(w, QFormat.INT8, symmetric=True)
    asym = quantize(w, QFormat.INT8, symmetric=False)
    assert float(quant_error(w, asym)) < float(quant_error(w, sym))


def test_int4_asymmetric_roundtrip():
    w = jax.random.uniform(KEY, (256, 64), minval=0.0, maxval=1.0)
    qt = quantize(w, QFormat.INT4, symmetric=False)
    assert qt.zeros is not None
    assert float(quant_error(w, qt)) < 0.05


def test_quantize_best_sweep():
    w = jax.random.normal(KEY, (256, 64))
    qt, err = quantize_best(w, [QFormat.INT4, QFormat.NF4])
    assert qt.fmt == QFormat.NF4  # NF4 wins on Gaussian weights
    assert err < 0.10


def test_fake_quant_shape_dtype():
    w = jax.random.normal(KEY, (256, 64), dtype=jnp.bfloat16)
    fq = fake_quant(w, QFormat.INT4)
    assert fq.shape == w.shape and fq.dtype == w.dtype


def test_qtensor_is_pytree():
    w = jax.random.normal(KEY, (256, 64))
    qt = quantize(w, QFormat.INT4)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 2  # codes + scales
    # jit through a QTensor argument
    f = jax.jit(lambda q: q.dequantize(jnp.float32).sum())
    f(qt)


def test_per_layer_quant_rule_filter():
    """Reference-style per-layer ablation: quantize ONE layer's attention
    (cases/test_lite.py:67-84 rewrites the config per layer)."""
    from koifish_tpu.config import ModelCard, QuantCard
    from koifish_tpu.models import init_params
    from koifish_tpu.quant.apply import quantize_params
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=3, n_embd=64,
                               n_head=4, n_kv_head=2, head_dim=16, n_ffn=128,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    qcard = QuantCard.from_json({"layers.1.self_attn": {"bits": 4},
                                 "group_size": 32})
    qp = quantize_params(params, qcard)
    assert isinstance(qp["layers"][1]["q"], QTensor)
    assert not isinstance(qp["layers"][0]["q"], QTensor)
    assert not isinstance(qp["layers"][2]["q"], QTensor)
    assert not isinstance(qp["layers"][1]["gate"], QTensor)


def test_kmeans_cluster_quantization():
    """Q_Cluster analog: learned per-tensor codebook beats/matches the
    fixed NF4 grid on a non-Gaussian (bimodal) weight distribution."""
    import jax
    import jax.numpy as jnp
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.quant.cluster import quantize_kmeans
    from koifish_tpu.quant.rtn import quant_error, quantize
    key = jax.random.PRNGKey(0)
    w = jnp.concatenate([
        jax.random.normal(key, (64, 128)) * 0.02 + 0.1,
        jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.02 - 0.1,
    ])
    qk = quantize_kmeans(w, bits=4, group=64)
    assert qk.codebook is not None and qk.codebook.shape == (16,)
    err_k = float(quant_error(w, qk))
    err_nf = float(quant_error(w, quantize(w, QFormat.NF4, group=64)))
    assert err_k < err_nf, (err_k, err_nf)
    assert err_k < 0.1


def test_sinkhorn_quantization_matmul():
    """SinkNormal analog: factors reconstruct exactly; the row factors
    fold into activations inside qmatmul."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.ops.matmul import qmatmul
    from koifish_tpu.quant.cluster import quantize_sinkhorn, sinkhorn_normalize
    from koifish_tpu.quant.rtn import quant_error, quantize
    key = jax.random.PRNGKey(0)
    # imbalanced rows/cols: per-row scale spread x per-col spread
    w = jax.random.normal(key, (128, 128)) * \
        jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (128, 1))) * \
        jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (1, 128)))
    wn, r, c = sinkhorn_normalize(w)
    np.testing.assert_allclose(np.asarray(r[:, None] * wn * c[None, :]),
                               np.asarray(w, np.float32), rtol=1e-4)
    qs = quantize_sinkhorn(w, QFormat.INT4, group=64)
    err_s = float(quant_error(w, qs))
    err_rtn = float(quant_error(w, quantize(w, QFormat.INT4, group=64)))
    assert err_s < err_rtn, (err_s, err_rtn)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 128), jnp.bfloat16)
    y = qmatmul(x, qs, out_dtype=jnp.float32)
    ref = jnp.dot(x.astype(jnp.float32), qs.dequantize(jnp.float32))
    rel = float(jnp.abs(y - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.05, rel


def test_f8_weight_format_roundtrip_and_matmul():
    """F8Ex analog (QUANT_MODE::F8Ex CLI_params.hpp:484, fp8 cast kernels
    operator.cuh:519-571): e5m2/e4m3 weights with per-group scales
    round-trip through quantize -> dequant/matmul within fp8 precision."""
    import jax
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.ops.matmul import qmatmul
    from koifish_tpu.quant.rtn import quantize

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128),
                          jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 256), jnp.bfloat16)
    for fmt, tol in ((QFormat.F8_E4M3, 0.04), (QFormat.F8_E5M2, 0.13)):
        qt = quantize(w, fmt, group=128)
        assert qt.codes.dtype == fmt.jnp_dtype
        wd = qt.dequantize(jnp.float32)
        rel = float(jnp.linalg.norm(wd - w) / jnp.linalg.norm(w))
        assert rel < tol, (fmt, rel)
        y = qmatmul(x, qt)
        yr = jnp.dot(x.astype(jnp.float32), w)
        mrel = float(jnp.linalg.norm(y.astype(jnp.float32) - yr)
                     / jnp.linalg.norm(yr))
        assert mrel < tol, (fmt, mrel)


def test_f8ex_quant_card_method():
    """quant_method F8Ex in a reference-style quantizer config selects the
    fp8 weight format end-to-end through quantize_params."""
    import jax
    from koifish_tpu.config import ModelCard, QuantCard
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.models import init_params, model_forward
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.quant.qtensor import QTensor

    qc = QuantCard.from_json({"self_attn": {"bits": 8, "quant_method": "F8Ex"},
                              "mlp": {"bits": 8, "quant_method": "F8Ex"}})
    assert qc.rules[0].fmt is QFormat.F8_E5M2
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=128,
                               n_head=4, n_kv_head=2, head_dim=32, n_ffn=256,
                               n_ctx=32, max_pos=64)
    params = init_params(card, jax.random.PRNGKey(0))
    qp = quantize_params(params, qc, card)
    qkinds = {lp["q"].fmt for lp in qp["layers"]
              if isinstance(lp["q"], QTensor)}
    assert qkinds == {QFormat.F8_E5M2}
    toks = jnp.zeros((1, 8), jnp.int32)
    ref = model_forward(card, params, toks).astype(jnp.float32)
    out = model_forward(card, qp, toks).astype(jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel


def test_mini_impurity_quantization():
    """MINI (Q_Impurity analog, GeQuant.cpp:763-830): per-row Lloyd-Max
    codebooks minimize within-bin variance (impurity) — beats RTN and
    the fixed NF4 grid on rows with heterogeneous ranges, and the
    matmul path consumes the per-row codebook QTensor."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.ops.matmul import qmatmul
    from koifish_tpu.quant.cluster import quantize_mini
    from koifish_tpu.quant.rtn import quant_error, quantize
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 128)) * 0.05
    w = w.at[::7].multiply(5.0)          # heavy-tail rows
    qm = quantize_mini(w, bits=4, group=64)
    assert qm.codebook is not None and qm.codebook.shape == (256, 16)
    err_m = float(quant_error(w, qm))
    err_rtn = float(quant_error(w, quantize(w, QFormat.INT4, group=64)))
    err_nf = float(quant_error(w, quantize(w, QFormat.NF4, group=64)))
    assert err_m < err_rtn and err_m < err_nf, (err_m, err_rtn, err_nf)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.bfloat16)
    got = qmatmul(x, qm)
    ref = jnp.dot(x.astype(jnp.float32), qm.dequantize(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_mini_mode_via_quant_card():
    """quant_method MINI routes through QuantCard -> quantize_params."""
    import jax.numpy as jnp
    from koifish_tpu.config import ModelCard, QuantCard
    from koifish_tpu.models import init_params
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.quant.qtensor import QTensor
    import jax
    card = ModelCard.from_arch("QWEN3", vocab_size=64, n_layer=1, n_embd=128,
                               n_head=2, n_kv_head=2, head_dim=64, n_ffn=128,
                               n_ctx=32, max_pos=32)
    params = init_params(card, jax.random.PRNGKey(0))
    qc = QuantCard.from_json({"mlp": {"bits": 4, "quant_method": "MINI"},
                              "group_size": 64})
    qp = quantize_params(params, qc, card)
    qts = [v for v in qp["layers"][0].values() if isinstance(v, QTensor)]
    assert qts and all(q.codebook is not None and q.codebook.ndim == 2
                       for q in qts)
