"""Rotary position embeddings, including YaRN/NTK long-context scaling.

Analog of the reference's rope kernel family (src/Device/CUDA/kernel/rope.cu
— ``rope_yarn`` ramp :137-155, neox/norm variants :157-260). TPU-first:
frequencies are precomputed once as a [max_pos, head_dim/2] table and the
rotation is a pure elementwise op XLA fuses into the surrounding QKV chain.
Uses neox-style (rotate-half) pairing, matching HF Qwen/LLaMA.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _yarn_scaled_inv_freq(inv_freq: jnp.ndarray, scaling: dict, head_dim: int):
    """YaRN frequency correction (interpolate low-freq, keep high-freq,
    linear ramp between) — reference rope.cu:129-155."""
    factor = float(scaling.get("factor", 1.0))
    orig_ctx = float(scaling.get("original_max_position_embeddings", 4096))
    beta_fast = float(scaling.get("beta_fast", 32.0))
    beta_slow = float(scaling.get("beta_slow", 1.0))

    wavelen = 2 * jnp.pi / inv_freq
    # ratio of context the wavelength covers
    low = orig_ctx / (beta_fast * 2 * jnp.pi) if beta_fast else 0.0
    high = orig_ctx / (beta_slow * 2 * jnp.pi) if beta_slow else 0.0
    ramp = jnp.clip((wavelen - low) / jnp.maximum(high - low, 1e-6), 0.0, 1.0)
    scaled = inv_freq / factor
    return inv_freq * (1 - ramp) + scaled * ramp


def rope_inv_freq(head_dim: int, theta: float = 10_000.0,
                  scaling: Optional[dict] = None):
    """(inv_freq [head_dim/2], attn_scale) with YaRN/linear scaling applied
    — the shared core of the table builder and the direct evaluator."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    attn_scale = 1.0
    if scaling:
        rtype = scaling.get("rope_type", scaling.get("type", "yarn"))
        if rtype == "linear":
            inv_freq = inv_freq / float(scaling.get("factor", 1.0))
        elif rtype in ("yarn", "ntk", "dynamic"):
            inv_freq = _yarn_scaled_inv_freq(inv_freq, scaling, head_dim)
            factor = float(scaling.get("factor", 1.0))
            if factor > 1.0:
                attn_scale = 0.1 * jnp.log(factor) + 1.0
    return inv_freq, attn_scale


def rope_freqs(head_dim: int, max_pos: int, theta: float = 10_000.0,
               scaling: Optional[dict] = None, dtype=jnp.float32):
    """Precompute (cos, sin) tables of shape [max_pos, head_dim/2]."""
    inv_freq, attn_scale = rope_inv_freq(head_dim, theta, scaling)
    pos = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)
    cos = (jnp.cos(freqs) * attn_scale).astype(dtype)
    sin = (jnp.sin(freqs) * attn_scale).astype(dtype)
    return cos, sin


def rope_cos_sin_at(head_dim: int, positions: jax.Array,
                    theta: float = 10_000.0, scaling: Optional[dict] = None,
                    dtype=jnp.float32):
    """(cos, sin) evaluated directly at arbitrary — possibly >= max_pos —
    integer ``positions`` [B, T]: the decode path's unbounded-position
    rope (streaming past the window must keep absolute angles advancing;
    a clamped table lookup silently collapses relative distances)."""
    inv_freq, attn_scale = rope_inv_freq(head_dim, theta, scaling)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return ((jnp.cos(freqs) * attn_scale).astype(dtype),
            (jnp.sin(freqs) * attn_scale).astype(dtype))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               positions: Optional[jax.Array]) -> jax.Array:
    """Rotate-half RoPE. x: [B, T, H, D]; positions: [B, T] or [T] table
    indices — or None when cos/sin are already gathered [B, T, half]
    (the direct-evaluation decode path, ``rope_cos_sin_at``)."""
    half = x.shape[-1] // 2
    if positions is None:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:
        c = cos[positions]  # [B, T, half] or [T, half]
        s = sin[positions]
        if c.ndim == 2:  # [T, half] -> broadcast batch
            c = c[None, :, None, :]
            s = s[None, :, None, :]
        else:            # [B, T, half]
            c = c[:, :, None, :]
            s = s[:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)
