"""QJL — Quantized Johnson-Lindenstrauss KV-cache quantization (keys).

Rebuild of the reference's Q_JL research mode (``CU_QJL_key`` family,
src/Device/CUDA/kernel/quantizer.cu:844-1050; declared KV modes
src/CLI_params.hpp:488-492 — there gated behind the disabled
``DEBUG.T_kvcache_quant`` flag; here a first-class option).

Method (QJL, Zandieh et al. 2024): project each key with a fixed random
Gaussian matrix P [D, m], store only the SIGN of the projection (1 bit
per sketch dim) plus the key's L2 norm. The attention score is the
unbiased estimator

    <q, k> ~= ||k|| * sqrt(pi/2) * mean_i sign((Pk)_i) * (Pq)_i

(E[sign(g.k_hat)(g.q)] = sqrt(2/pi) <q, k_hat> for Gaussian g). Keys
cost m/8 bytes + 4 norm bytes instead of 2D bytes — e.g. D=128, m=256:
36 B vs 256 B. Values stay INT8 (per the paper; sign sketches don't
reconstruct values).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_SQRT_PI_OVER_2 = 1.2533141373155003


@functools.lru_cache(maxsize=8)
def _proj_cached(d: int, m: int, seed: int):
    return jax.random.normal(jax.random.PRNGKey(seed), (d, m), jnp.float32)


def qjl_projection(d: int, m: int, seed: int = 20260713) -> jax.Array:
    """Fixed Gaussian JL matrix [D, m] (seed default = XI_CARD mask_seed)."""
    return _proj_cached(d, m, seed)


def qjl_encode_keys(k: jax.Array, proj: jax.Array,
                    ) -> Tuple[jax.Array, jax.Array]:
    """k [..., D] → (sign bits packed [..., m//8] uint8, norms [...] f32)."""
    kp = jnp.einsum("...d,dm->...m", k.astype(jnp.float32), proj)
    bits = (kp >= 0).astype(jnp.uint8)
    m = proj.shape[1]
    packed = bits.reshape(*bits.shape[:-1], m // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))
    packed = jnp.sum(packed * weights, axis=-1).astype(jnp.uint8)
    norms = jnp.linalg.norm(k.astype(jnp.float32), axis=-1)
    return packed, norms


def qjl_unpack_signs(packed: jax.Array) -> jax.Array:
    """[..., m//8] uint8 → [..., m] f32 in {-1, +1}."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    bits = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    return bits.astype(jnp.float32) * 2.0 - 1.0


def qjl_scores(q: jax.Array, ksign_packed: jax.Array, knorm: jax.Array,
               proj: jax.Array) -> jax.Array:
    """Estimated attention logits.

    q [B, H, D]; ksign_packed [B, Hkv, S, m//8]; knorm [B, Hkv, S]
    → scores [B, H, S] (pre-softmax, unscaled by 1/sqrt(D)).
    """
    b, hq, d = q.shape
    hkv, s = ksign_packed.shape[1], ksign_packed.shape[2]
    g = hq // hkv
    m = proj.shape[1]
    qp = jnp.einsum("bhd,dm->bhm", q.astype(jnp.float32), proj)
    signs = qjl_unpack_signs(ksign_packed)                  # [B,Hkv,S,m]
    qp_g = qp.reshape(b, hkv, g, m)
    est = jnp.einsum("bkgm,bksm->bkgs", qp_g, signs)
    est = est * (_SQRT_PI_OVER_2 / m) * knorm[:, :, None, :]
    return est.reshape(b, hq, s)


def qjl_decode_attention(
    q: jax.Array,            # [B, Hq, D]
    ksign_packed: jax.Array, # [B, Hkv, S, m//8] uint8
    knorm: jax.Array,        # [B, Hkv, S] f32
    v: jax.Array,            # [B, Hkv, S, Dv] bf16 (already dequantized)
    kv_mask: jax.Array,      # [B, S] bool
    proj: jax.Array,         # [D, m]
    scale: float,
) -> jax.Array:
    """Decode attention with QJL-estimated key scores."""
    b, hq, d = q.shape
    hkv = v.shape[1]
    g = hq // hkv
    logits = qjl_scores(q, ksign_packed, knorm, proj) * scale  # [B,Hq,S]
    logits = jnp.where(kv_mask[:, None, :], logits, -1e30)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p_g = p.reshape(b, hkv, g, -1)
    out = jnp.einsum("bkgs,bksd->bkgd", p_g, v.astype(jnp.float32))
    return out.reshape(b, hq, v.shape[-1]).astype(q.dtype)
