"""INT8 forward matmuls for training (SwitchBack-style).

The reference's headline GPT2 numbers come from FP8 GEMMs (F8_B80 case,
cases/gpt2/1558M_F8_B80; FP8 cast kernels operator.cuh:519-571). v5e has
no FP8 MXU but its int8 path runs at 2× the bf16 rate — the TPU-native
analog is dynamic-range int8 matmuls:

    y = (q8(x) @ q8(w)) · s_x[row] · s_w[col]

- per-token (row) activation scales, per-out-feature (column) weight
  scales — both rank-1, so the scaling is exact outside the dot and the
  only error is rounding;
- backward stays bf16 (dx = g·wᵀ, dw = xᵀ·g) — the SwitchBack recipe:
  quantizing gradient matmuls is what destabilizes training, forward
  rounding behaves like mild QAT.

XLA lowers int8×int8→int32 `dot` to the MXU natively; no Pallas needed.
Enable per-step with TrainCard.int8_matmul (ambient switch consumed by
ops/matmul.linear for plain bf16 weights above a size threshold).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = False


def set_train_int8(on: bool) -> None:
    """Ambient switch — set BEFORE tracing the train step (static)."""
    global _ENABLED
    _ENABLED = on


def train_int8_enabled() -> bool:
    return _ENABLED


def _rowwise_q8(x):
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


def _colwise_q8(w):
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """x [..., K] @ w [K, N] with int8 forward, bf16 backward."""
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    xq, sx = _rowwise_q8(x2)
    wq, sw = _colwise_q8(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * sw
    return y.reshape(*lead, w.shape[-1]).astype(x.dtype)


def _fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    gf = g.astype(jnp.bfloat16)
    dx = jnp.dot(gf, w.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    g2 = gf.reshape(-1, g.shape[-1])
    dw = jnp.dot(x2.T, g2, preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


int8_matmul.defvjp(_fwd, _bwd)
