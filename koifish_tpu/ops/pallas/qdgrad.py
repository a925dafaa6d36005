"""Per-tile dynamic-int8 dgrad GEMM — dx = dy @ ŵᵀ at the 2x MXU rate.

The backward's dgrad dots are the largest bf16 block left in the big-
model train step (~78 ms of GPT2-774M's 605 ms at the FFN widths).
Round 3's XLA attempt (scale-folded dy, ops/int8_train.py) measured
NEGATIVE: folding w's per-column scales into dy and row-quantizing it
costs three extra HBM passes over a [M, N] tensor — more than the int8
dot saves. This kernel does the fold + quantization PER TILE in VMEM:

    grid (M/BM, N/BN sequential):
        t   = dy_tile · sw_tile            (VMEM elementwise)
        sx  = rowmax|t| / 127              (per-tile row scales)
        dx += (q8(t) @ wq_tileᵀ) · sx      (int8 MXU dot, f32 epilogue)

Zero extra HBM traffic (dy is read once, by the kernel), and the
per-TILE row scales are strictly finer than a global row quantization —
each [BM, BN] tile gets its own dynamic range. wq/sw are the SAME
forward codes ops/int8_train saves, so the dgrad sees exactly the
weights the forward used (reference parity: fwd/bwd share one
quantization, GeQuant's shadow-weight discipline).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256
BN = 1024

_INTERPRET = False


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _platform_is_tpu() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def eligible(m: int, n: int, k: int) -> bool:
    return (_platform_is_tpu() and m % BM == 0 and n % BN == 0
            and k % 128 == 0 and k <= 4096)


@functools.partial(jax.jit, static_argnames=())
def _dgrad_call(dy, wq, sw):
    m, n = dy.shape
    k = wq.shape[0]
    nj = n // BN
    dx = pl.pallas_call(
        functools.partial(_dgrad_kernel, NJ=nj),
        grid=(m // BM, nj),
        in_specs=[
            pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, k), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * n + n * k) * 2 + m * k * 2,
            transcendentals=0,
        ),
    )(dy, wq, sw)
    return dx


def _dgrad_kernel(dy_ref, wq_ref, sw_ref, dx_ref, acc, *, NJ):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    t = dy_ref[...].astype(jnp.float32) * sw_ref[...]       # fold w scales
    sx = jnp.max(jnp.abs(t), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    q = jnp.clip(jnp.round(t / sx), -127, 127).astype(jnp.int8)
    d = jax.lax.dot_general(q, wq_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # [BM, K]
    acc[...] += d.astype(jnp.float32) * sx

    @pl.when(j == NJ - 1)
    def _():
        dx_ref[...] = acc[...].astype(dx_ref.dtype)


def dgrad_int8_tile_or_none(dy: jax.Array, wq: jax.Array, sw: jax.Array):
    """dx = dy @ (wq·sw)ᵀ via the per-tile int8 kernel, or None when the
    shape doesn't qualify (caller falls back to the bf16 dequant dot).
    dy [M, N] bf16; wq [K, N] int8 (forward codes); sw [1, N] f32."""
    m, n = dy.shape
    k = wq.shape[0]
    from koifish_tpu.utils import kernel_log
    if not eligible(m, n, k):
        kernel_log.fallback("qdgrad_int8_tile",
                            f"m={m} n={n} k={k} -> bf16 dequant dot")
        return None
    kernel_log.choice("qdgrad_int8_tile", f"m={m} n={n} k={k}")
    return _dgrad_call(dy.astype(jnp.bfloat16), wq,
                       sw.reshape(1, n).astype(jnp.float32))
