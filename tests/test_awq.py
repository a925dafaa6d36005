"""AWQ import: pack→convert→dequant matches the AWQ dequant formula."""
import numpy as np
import jax.numpy as jnp

from koifish_tpu.quant.awq import (
    AWQ_ORDER, awq_to_qtensor, convert_awq_weights, is_awq_checkpoint)


def _pack_awq(codes: np.ndarray) -> np.ndarray:
    """[rows, cols] uint4 -> int32 [rows, cols/8] with AWQ column order."""
    rows, cols = codes.shape
    c = codes.reshape(rows, cols // 8, 8).astype(np.uint32)
    out = np.zeros((rows, cols // 8), np.uint32)
    for slot in range(8):
        out |= c[:, :, AWQ_ORDER[slot]] << (4 * slot)
    return out.astype(np.int32)


def test_awq_roundtrip():
    rng = np.random.default_rng(0)
    n_in, n_out, g = 256, 64, 128
    codes = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
    zeros = rng.integers(6, 10, (n_in // g, n_out)).astype(np.uint8)
    scales = (rng.random((n_in // g, n_out), np.float32) * 0.02 + 0.01)

    qweight = _pack_awq(codes)
    qzeros = _pack_awq(zeros)
    qt = awq_to_qtensor(qweight, qzeros, scales.astype(np.float16))
    assert qt.shape == (n_in, n_out) and qt.group == g

    expected = (codes.astype(np.float32)
                - np.repeat(zeros.astype(np.float32), g, axis=0)) \
        * np.repeat(scales, g, axis=0).astype(np.float32)
    got = np.asarray(qt.dequantize(jnp.float32))
    np.testing.assert_allclose(got, expected.astype(np.float32), rtol=1e-2,
                               atol=1e-3)


def test_convert_awq_dict():
    rng = np.random.default_rng(1)
    raw = {
        "model.layers.0.self_attn.q_proj.qweight": _pack_awq(
            rng.integers(0, 16, (128, 64)).astype(np.uint8)),
        "model.layers.0.self_attn.q_proj.qzeros": _pack_awq(
            rng.integers(0, 16, (1, 64)).astype(np.uint8)),
        "model.layers.0.self_attn.q_proj.scales": np.ones((1, 64), np.float16),
        "model.norm.weight": np.ones(16, np.float32),
    }
    assert is_awq_checkpoint(raw)
    out = convert_awq_weights(raw)
    assert "model.layers.0.self_attn.q_proj.weight" in out
    assert "model.layers.0.self_attn.q_proj.qweight" not in out
    assert "model.norm.weight" in out
