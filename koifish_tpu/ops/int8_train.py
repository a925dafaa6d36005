"""INT8 training matmuls — the TPU analog of the reference's FP8 GEMMs.

The reference's headline GPT2 numbers come from FP8 GEMMs (F8_B80 case,
cases/gpt2/1558M_F8_B80; FP8 cast kernels operator.cuh:519-571). v5e has
no FP8 MXU but its int8 path runs at ~2x the bf16 rate — the TPU-native
analog is dynamic-range int8 matmuls:

    y = (q8(x) @ q8(w)) . s_x[row] . s_w[col]

Recipe (round-2, after the round-1 fwd-only negative result):

- forward:  per-token (row) activation scales x per-out-feature (column)
  weight scales — both rank-1, so the scaling is exact outside the dot
  and the only error is rounding.
- dgrad in int8 too: dx = q8(dy . s_w) @ w8^T . s_dy — REUSES the
  forward's weight codes (saved as residuals), so weights are quantized
  once per step, not once per matmul ("hoisted master-weight quant",
  the analog of the reference's shadoW master + packed data split,
  Pipe.hpp:114-121).  Column scales fold into dy before its row quant,
  so the transposed dot needs no per-K rescale.
- wgrad: dw = x^T @ dy stays bf16 by default (per-token precision is
  what stabilizes training — SwitchBack recipe); set
  ``set_train_int8(True, wgrad=True)`` for full-int8 experiments
  (per-column scales on both operands of the [K, N] = [K, M]@[M, N]
  dot; the contraction axis M is the token axis, so scales must live on
  the non-contracted axes: s_col(x)[K] x s_col(dy)[N]).

XLA lowers int8 x int8 -> int32 ``dot`` to the MXU natively; no Pallas
needed. Enable per-step with TrainCard.int8_matmul (ambient switch
consumed by ops/matmul.linear for plain bf16 weights above a size
threshold).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_ENABLED = False
_WGRAD = False


def set_train_int8(on: bool, wgrad: bool = False) -> None:
    """Ambient switch — set BEFORE tracing the train step (static)."""
    global _ENABLED, _WGRAD
    _ENABLED = on
    _WGRAD = wgrad


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


def _i8dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.int32)


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """x [..., K] @ w [K, N]: int8 forward + int8 dgrad (codes reused),
    bf16 wgrad (int8 with wgrad=True)."""
    return _fwd(x, w)[0]


def _fwd_impl(x2, wq, sw):
    xq, sx = _rowwise_q8(x2)
    acc = _i8dot(xq, wq, ((1,), (0,)))
    return acc.astype(jnp.float32) * sx * sw


def _fwd(x, w):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    wq, sw = _colwise_q8(w)          # quantized once; reused by dgrad
    y = _fwd_impl(x2, wq, sw)
    y = y.reshape(*lead, w.shape[-1]).astype(x.dtype)
    # 0-size stub keeps w's dtype for the bwd cotangent (w itself is NOT
    # saved — the whole point is that dgrad reuses the int8 codes)
    return y, (x, wq, sw, jnp.zeros((0,), w.dtype))


def _bwd(res, g):
    x, wq, sw, wstub = res
    lead = x.shape[:-1]
    g2 = g.reshape(-1, g.shape[-1])

    # dgrad: dx = (g . s_w) @ w8^T — fold the column scales into g so the
    # transposed int8 dot needs no per-K rescale, then row-quantize
    gs = g2.astype(jnp.float32) * sw
    gq, sg = _rowwise_q8(gs)
    dx = _i8dot(gq, wq, ((1,), (1,))).astype(jnp.float32) * sg
    dx = dx.reshape(*lead, x.shape[-1]).astype(x.dtype)

    x2 = x.reshape(-1, x.shape[-1])
    if _WGRAD:
        # both operands column-quantized along their non-contracted axes
        xq_c, sx_c = _colwise_q8(x2)          # scales over K
        gq_c, sg_c = _colwise_q8(g2)          # scales over N
        dw = _i8dot(xq_c, gq_c, ((0,), (0,))).astype(jnp.float32)
        dw = dw * sx_c.reshape(-1, 1) * sg_c.reshape(1, -1)
    else:
        dw = jnp.dot(x2.astype(jnp.bfloat16).T, g2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return dx, dw.astype(wstub.dtype)


int8_matmul.defvjp(_fwd, _bwd)
