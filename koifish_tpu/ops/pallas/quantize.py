"""Pallas activation-quantization kernels for int8 training.

The int8 training recipe (ops/int8_train.py) needs per-token (row) and
per-feature (column) absmax quantization of activations/gradients at
HBM bandwidth. XLA's lowering of the naive reduce+divide+round chain
measured ~100 GB/s effective on v5e — an order of magnitude below the
~800 GB/s the memory system gives a fused single-pass kernel. These
kernels are the TPU analog of the reference's FP8 cast kernels
(src/Device/CUDA/kernel/operator.cuh:519-571).

rowquant:  x [M, K] bf16 → (q int8, scale f32 [M, 1]); scale = absmax/127
colquant:  x [M, K] bf16 → (q int8, scale f32 [1, K]) — two passes (the
           reduction axis is the streaming axis), still bandwidth-bound.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _rowquant_kernel(x_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)     # [TM, 1]
    scale = jnp.maximum(absmax, 1e-12) * (1.0 / 127.0)
    recip = 127.0 / jnp.maximum(absmax, 1e-12)
    q = jnp.clip(jnp.rint(x * recip), -127.0, 127.0)
    q_ref[:] = q.astype(jnp.int8)
    # scalar-per-row outputs must still be 128-lane tiles (min-tile rule;
    # same trick as the flash kernel's lse output)
    s_ref[:] = jnp.broadcast_to(scale, s_ref.shape)


@functools.partial(jax.jit, static_argnames=("block_m",))
def rowquant(x: jax.Array, block_m: int = 256):
    """x [M, K] → (q int8 [M, K], scale f32 [M, 1]). M % block_m == 0
    handled by shrinking the block; K must be lane-aligned (128)."""
    M, K = x.shape
    bm = block_m
    while M % bm:
        bm //= 2
    grid = (M // bm,)
    q, s = pl.pallas_call(
        _rowquant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(x)
    return q, s[:, :1]


def _colabs_kernel(x_ref, amax_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)
    acc[:] = jnp.maximum(acc[:], jnp.max(jnp.abs(x), axis=0, keepdims=True))

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        amax_ref[:] = jnp.broadcast_to(acc[:], amax_ref.shape)


def _colquant_kernel(x_ref, amax_ref, q_ref):
    x = x_ref[:].astype(jnp.float32)
    recip = 127.0 / jnp.maximum(amax_ref[0:1, :], 1e-12)    # [1, K]
    q_ref[:] = jnp.clip(jnp.rint(x * recip), -127.0, 127.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m",))
def colquant(x: jax.Array, block_m: int = 512):
    """x [M, K] → (q int8 [M, K], scale f32 [1, K]); two streaming passes
    (absmax over the M axis, then quantize)."""
    M, K = x.shape
    bm = block_m
    while M % bm:
        bm //= 2
    grid = (M // bm,)
    amax = pl.pallas_call(
        _colabs_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, K), jnp.float32)],
        interpret=_INTERPRET,
    )(x)
    q = pl.pallas_call(
        _colquant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.int8),
        interpret=_INTERPRET,
    )(x, amax)
    return q, amax[:1] * (1.0 / 127.0)
