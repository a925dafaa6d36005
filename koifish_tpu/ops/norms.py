"""Normalization ops — RMSNorm / LayerNorm (+ fused residual add).

Analog of the reference's ``LayerNormal`` neuron and its kernel family
(reference: src/Manifold/Neuron.hpp:438-458,
src/Device/CUDA/kernel/layernorm.cuh). On TPU these are left to XLA
fusion by default — a norm is bandwidth-bound elementwise work that XLA
fuses into neighbors; the Pallas variants exist for the fused
norm+matmul chains in the decode path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-6,
            residual: Optional[jax.Array] = None) -> jax.Array:
    """RMSNorm in f32 math on bf16 storage (reference CU_rms_forward_*)."""
    if residual is not None:
        x = x + residual
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layernorm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None,
              eps: float = 1e-5, residual: Optional[jax.Array] = None) -> jax.Array:
    if residual is not None:
        x = x + residual
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
