"""Cross-entropy loss over logits — the classifier head's loss.

Analog of the reference's fused softmax+CE+dlogits kernel
(``fused_classifier``, src/Device/CUDA/kernel/fused_classifier.cuh:68).
On TPU the fused form is achieved by computing the loss from *hidden
states and the (possibly quantized) head weight* without materializing
the full [B,T,V] probability tensor gradient separately — XLA fuses the
log-softmax chain; a Pallas blocked-vocab variant covers very large V.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,           # [B, T, V]
    targets: jax.Array,          # [B, T] int32
    mask: Optional[jax.Array] = None,  # [B, T] — 1/True = counted
    z_loss: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (mean_loss, per_token_loss[B,T]) in f32.

    Per-token masked CE, same semantics as the reference's per-token CE →
    running-mean PPL pipeline (``LossOnResult``, src/TokenSet/TokenSet.cpp:392)
    and SFT label masks (MASK_FLAG, DataLoader.hpp:73-79).
    """
    lf = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    gold = jnp.take_along_axis(lf, targets[..., None], axis=-1)[..., 0]
    per_tok = lse - gold
    if z_loss:
        per_tok = per_tok + z_loss * jnp.square(lse)
    if mask is None:
        return per_tok.mean(), per_tok
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    return (per_tok * m).sum() / denom, per_tok
