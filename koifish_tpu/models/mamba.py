"""Mamba (selective SSM) blocks — functional training/eval forward.

The reference declares an LLM_MAMBA arch but its implementation is a
stub (BuildTarget returns nullptr, src/Manifold/gLLMx.cpp:20); this is a
working selective-SSM implementation, TPU-first: the linear recurrence
h_t = a_t·h_{t-1} + b_t runs as a parallel ``associative_scan`` over the
time axis (log-depth on device) instead of a sequential loop.

Block: x → in_proj → (u, z); depthwise causal conv1d(k=4) → silu;
selection: dt = softplus(dt_proj(x_proj_dt(u))), B,C = x_proj(u);
SSM scan over state dim N; y = C·h + D·u; out = out_proj(y · silu(z)).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard

D_STATE = 16
D_CONV = 4
EXPAND = 2


def _dims(card: ModelCard):
    ei = EXPAND * card.n_embd
    dt_rank = max(card.n_embd // 16, 1)
    return ei, dt_rank


def init_mamba_layer(card: ModelCard, key: jax.Array, dtype=jnp.bfloat16,
                     ) -> Dict[str, Any]:
    E = card.n_embd
    ei, dt_rank = _dims(card)
    ks = jax.random.split(key, 6)
    std = 0.02

    def nrm(k, shape, s=std):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    # S4D-real initialization for A; dt bias so softplus(dt) spans
    # [1e-3, 1e-1] (standard mamba init)
    A = jnp.broadcast_to(jnp.arange(1, D_STATE + 1, dtype=jnp.float32),
                         (ei, D_STATE))
    dt = jnp.exp(jax.random.uniform(ks[0], (ei,)) *
                 (math.log(0.1) - math.log(1e-3)) + math.log(1e-3))
    dt_bias = dt + jnp.log(-jnp.expm1(-dt))   # inverse softplus

    return {
        "in_proj": nrm(ks[1], (E, 2 * ei)),
        "conv_w": nrm(ks[2], (D_CONV, ei), 0.2),
        "conv_b": jnp.zeros((ei,), dtype),
        "x_proj": nrm(ks[3], (ei, dt_rank + 2 * D_STATE)),
        "dt_proj": nrm(ks[4], (dt_rank, ei), dt_rank ** -0.5),
        "dt_bias": dt_bias.astype(jnp.float32),
        "A_log": jnp.log(A),
        "Dd": jnp.ones((ei,), jnp.float32),
        "out_proj": nrm(ks[5], (ei, E), std / math.sqrt(2 * card.n_layer)),
    }


def _causal_conv1d(u: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise causal conv over time. u [B,T,Ei]; w [K,Ei]."""
    K = w.shape[0]
    up = jnp.pad(u, ((0, 0), (K - 1, 0), (0, 0)))
    out = sum(up[:, i: i + u.shape[1]] * w[i][None, None, :]
              for i in range(K))
    return out + b[None, None, :]


def mamba_block(card: ModelCard, lp: Dict[str, Any], x: jax.Array) -> jax.Array:
    """One mamba mixer over [B, T, E]."""
    B, T, E = x.shape
    ei, dt_rank = _dims(card)

    xz = jnp.dot(x, lp["in_proj"].astype(x.dtype))
    u, z = xz[..., :ei], xz[..., ei:]
    u = _causal_conv1d(u, lp["conv_w"].astype(u.dtype),
                       lp["conv_b"].astype(u.dtype))
    u = jax.nn.silu(u.astype(jnp.float32))              # [B,T,Ei] f32

    sel = jnp.dot(u.astype(x.dtype), lp["x_proj"].astype(x.dtype))
    dt_in = sel[..., :dt_rank]
    Bm = sel[..., dt_rank:dt_rank + D_STATE].astype(jnp.float32)
    Cm = sel[..., dt_rank + D_STATE:].astype(jnp.float32)
    dt = jax.nn.softplus(
        jnp.dot(dt_in, lp["dt_proj"].astype(x.dtype)).astype(jnp.float32)
        + lp["dt_bias"][None, None, :])                  # [B,T,Ei]

    A = -jnp.exp(lp["A_log"].astype(jnp.float32))        # [Ei,N]
    a = jnp.exp(dt[..., None] * A[None, None])           # [B,T,Ei,N]
    b = (dt * u)[..., None] * Bm[:, :, None, :]          # [B,T,Ei,N]

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, h = jax.lax.associative_scan(combine, (a, b), axis=1)
    y = jnp.einsum("btun,btn->btu", h, Cm)               # [B,T,Ei]
    y = y + lp["Dd"][None, None, :] * u
    y = y * jax.nn.silu(z.astype(jnp.float32))
    return jnp.dot(y.astype(x.dtype), lp["out_proj"].astype(x.dtype))
