"""INT8 training matmuls — the TPU analog of the reference's FP8 GEMMs.

The reference's headline GPT2 numbers come from FP8 GEMMs (F8_B80 case,
cases/gpt2/1558M_F8_B80; FP8 cast kernels operator.cuh:519-571). v5e has
no FP8 MXU but its int8 path runs well above the bf16 rate (measured on
the head GEMM: 167 T/s bf16 vs 282 T/s int8 with the fused
int32->f32-scale->bf16 epilogue) — the TPU-native analog is
dynamic-range int8 matmuls:

    y = (q8(x) @ q8(w)) . s_x[row] . s_w[col]

Where int8 pays (round-2 measurement, GPT2-124M B=16):

- A dynamic-quant pass over a [M, N] operand costs ~N/K of the dot's own
  time (it re-reads the dot's big operand from HBM). At GPT2's dense
  sizes (K, N <= 3072) quantizing the activations/grads costs MORE than
  the MXU saves: full int8 measured 121K tok/s vs 137K bf16. The win
  lives where the weight is huge — the lm head (768 x 50304): the fwd
  dot drops 7.6 -> 4.5 ms and the x-quant is over a tiny [M, 768].
  So ``int8_matmul`` only engages when K*N >= ``min_weight_elems``
  (default 2^24; the head qualifies, dense layers of >=4096-wide models
  qualify too, GPT2-124M's dense layers don't).
- dgrad: dy for the head is [M, 50304] — row-quantizing it costs three
  passes over 1.65 GB, more than the int8 dot saves. dgrad therefore
  runs bf16 against the DEQUANTIZED forward codes (w is never saved —
  one 115 MB pass rebuilds it from the int8 residuals), matching the
  fwd's rounding.
- wgrad: always bf16. Int8 wgrad measured catastrophic for loss
  (9.25 vs 8.15 @ step 13) at zero speed gain.

XLA lowers int8 x int8 -> int32 ``dot`` to the MXU natively and fuses
the scale epilogue into the dot output; no Pallas needed. Enable
per-step with TrainCard.int8_matmul — make_train_step pushes an
``Int8Policy`` scope (ops/tracectx.py) around its trace and
ops/matmul.qmatmul consults it for plain bf16 weights above the size
threshold.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_matmul(x: jax.Array, w: jax.Array, wgrad: bool = False,
                dgrad: bool = False) -> jax.Array:
    """x [..., K] @ w [K, N]: int8 forward (fused scale epilogue), bf16
    dgrad/wgrad against the dequantized forward codes by default —
    static flags so the bwd trace can't depend on ambient state.

    ``dgrad=True``: int8 dgrad that REUSES the forward's int8 codes via
    scale folding. w's per-column scales s_w[N] ride the contracted dim
    of dy @ w^T, so they can't factor out of an int8 dot — but
    dx = dy @ (c . s_w)^T = (dy . s_w) @ c^T: fold s_w into dy first
    (one fusable elementwise pass), then rowwise-quantize the folded dy.
    No weight requantization, both MXU operands int8.

    ``wgrad=True``: the (measured-harmful, experimental) int8 wgrad."""
    return _fwd(x, w, wgrad, dgrad)[0]


def _fwd_impl(x2, wq, sw):
    xq, sx = _rowwise_q8(x2)
    acc = _i8dot(xq, wq, ((1,), (0,)))
    return acc.astype(jnp.float32) * sx * sw


def _fwd(x, w, wgrad, dgrad):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    wq, sw = _colwise_q8(w)
    y = _fwd_impl(x2, wq, sw)
    y = y.reshape(*lead, w.shape[-1]).astype(x.dtype)
    # 0-size stub keeps w's dtype for the bwd cotangent (w itself is NOT
    # saved — the bwd rebuilds it from the int8 codes)
    return y, (x, wq, sw, jnp.zeros((0,), w.dtype))


def _bwd(wgrad, dgrad, res, g):
    x, wq, sw, wstub = res
    lead = x.shape[:-1]
    g2 = g.reshape(-1, g.shape[-1])

    if dgrad == "tile":
        # per-tile dynamic quantization INSIDE the kernel: the fold and
        # the quant pass run in VMEM, zero extra HBM traffic (the
        # XLA scale-fold below costs three passes over dy and measured
        # net-negative at 774M widths — ops/pallas/qdgrad.py)
        from koifish_tpu.ops.pallas.qdgrad import dgrad_int8_tile_or_none
        dx = dgrad_int8_tile_or_none(g2, wq, sw)
        if dx is None:   # shape ineligible -> the measured-best bf16 dot
            wd = (wq.astype(jnp.float32) * sw).astype(jnp.bfloat16)
            dx = jnp.dot(g2.astype(jnp.bfloat16), wd.T,
                         preferred_element_type=jnp.float32)
    elif dgrad:
        # int8 dgrad, scale-folded: dx = (dy . s_w) @ codes^T (docstring)
        gs = g2.astype(jnp.float32) * sw                      # [M, N]
        gq, sg = _rowwise_q8(gs)
        dx = _i8dot(gq, wq, ((1,), (1,))).astype(jnp.float32) * sg
    else:
        # dgrad: bf16 dot against the dequantized forward codes — the dy
        # operand is read once by the dot, never re-read by a quant pass.
        wd = (wq.astype(jnp.float32) * sw).astype(jnp.bfloat16)  # [K, N]
        dx = jnp.dot(g2.astype(jnp.bfloat16), wd.T,
                     preferred_element_type=jnp.float32)
    dx = dx.reshape(*lead, x.shape[-1]).astype(x.dtype)

    x2 = x.reshape(-1, x.shape[-1])
    if wgrad:
        # experimental full-int8 (both operands column-quantized along
        # their non-contracted axes). Measured harmful for loss.
        xq_c, sx_c = _colwise_q8(x2)          # scales over K
        gq_c, sg_c = _colwise_q8(g2)          # scales over N
        dw = _i8dot(xq_c, gq_c, ((0,), (0,))).astype(jnp.float32)
        dw = dw * sx_c.reshape(-1, 1) * sg_c.reshape(1, -1)
    else:
        dw = jnp.dot(x2.astype(jnp.bfloat16).T, g2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return dx, dw.astype(wstub.dtype)


int8_matmul.defvjp(_fwd, _bwd)
