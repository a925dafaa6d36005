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

    Custom VJP: XLA's autodiff of logsumexp saves the f32 softmax as a
    residual (3.3 GB for GPT2's 50k vocab at B=16 — xprof showed it as
    the single hottest fusion). Here the backward recomputes
    p = exp(logits - lse) from the bf16 logits + the [B,T] lse, so only
    O(B·T) residuals persist and dlogits streams at logits dtype.
    """
    if z_loss:
        # z-loss path is rare (MoE aux) — plain autodiff version
        lf = logits.astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(lf, axis=-1)
        gold = jnp.take_along_axis(lf, targets[..., None], axis=-1)[..., 0]
        per_tok = lse - gold + z_loss * jnp.square(lse)
        if mask is None:
            return per_tok.mean(), per_tok
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        return (per_tok * m).sum() / denom, per_tok
    return _ce(logits, targets, mask)


@jax.custom_vjp
def _ce(logits, targets, mask):
    loss, per_tok, _ = _ce_fwd_impl(logits, targets, mask)
    return loss, per_tok


def _ce_fwd_impl(logits, targets, mask):
    # gold gathers from the ORIGINAL logits (upcast after): if the f32
    # upcast has two consumers XLA materializes it — a 3.3 GB HBM write
    # for GPT2's vocab at B=16, measured 7.4 ms/step. With logsumexp as
    # the sole consumer the upcast fuses into a streaming reduce.
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None],
                               axis=-1)[..., 0].astype(jnp.float32)
    per_tok = lse - gold
    if mask is None:
        return per_tok.mean(), per_tok, lse
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    return (per_tok * m).sum() / denom, per_tok, lse


def _ce_fwd(logits, targets, mask):
    loss, per_tok, lse = _ce_fwd_impl(logits, targets, mask)
    return (loss, per_tok), (logits, targets, mask, lse)


def _ce_bwd(res, cts):
    g_loss, g_tok = cts
    logits, targets, mask, lse = res
    B, T, V = logits.shape
    if mask is None:
        w = jnp.full((B, T), 1.0 / (B * T), jnp.float32) * g_loss
    else:
        m = mask.astype(jnp.float32)
        w = m / jnp.maximum(m.sum(), 1.0) * g_loss
    w = w + g_tok.astype(jnp.float32)             # per-token cotangent
    # dlogits = (softmax - onehot) * w  — p recomputed, one streamed pass
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    onehot = jax.nn.one_hot(targets, V, dtype=jnp.float32)
    dlogits = ((p - onehot) * w[..., None]).astype(logits.dtype)
    return dlogits, None, None


_ce.defvjp(_ce_fwd, _ce_bwd)


def fused_ce_loss(
    hidden: jax.Array,           # [B, T, E]
    head_w: jax.Array,           # [E, V] (tied: wte.T)
    targets: jax.Array,          # [B, T] int32
    mask: Optional[jax.Array] = None,
    chunk: int = 8192,
    use_int8: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """CE directly from hidden states + head weight, scanning VOCAB CHUNKS
    with a running logsumexp — the [B,T,V] logits tensor is never
    materialized (5 GB for Qwen3's 152k vocab at B=16). This is the true
    fused-classifier analog (reference fused_classifier.cuh:68) and what
    lets large-vocab models train at batch on one chip.

    ``use_int8``: run the chunk dots as dynamic int8 GEMMs (the FP8 head
    GEMM analog — ops/int8_train.int8_matmul custom VJP: int8 fwd, bf16
    grads vs the dequantized codes). Default: on when TrainCard's
    int8_matmul switch is set and the whole head passes its size gate.
    """
    B, T, E = hidden.shape
    V = head_w.shape[-1]
    if use_pallas is not False:
        # fused Pallas classifier: per-tile logits live in VMEM only, no
        # [M, chunk] intermediates through HBM. Takes precedence over
        # the int8 scan too: the scan is HBM-intermediate-bound, not
        # MXU-bound, so the bf16 kernel wins regardless.
        from koifish_tpu.ops.pallas.fused_ce import fused_ce_pallas_or_none
        out = fused_ce_pallas_or_none(hidden, head_w, targets, mask)
        if out is not None:
            return out
    if use_int8 is None:
        from koifish_tpu.ops.tracectx import current_int8
        pol = current_int8()
        use_int8 = pol is not None and pol.applies((E, V))
    chunk = min(chunk, V)
    n_chunks = -(-V // chunk)
    w = head_w.astype(jnp.bfloat16)

    x2 = hidden.reshape(B * T, E)
    tgt = targets.reshape(B * T)

    # Chunks are dynamic_slice views of the ORIGINAL [E, V] head, clamped
    # at the tail. The previous layout — pad V to a chunk multiple, then
    # reshape+transpose to [C, E, chunk] scan xs — rebuilt the entire
    # head weight every step (a 147 MB copy at GPT2-774M, 14 ms/step on
    # v5e, measured via prof_step.py); the slice reads the weight in
    # place and fuses into the chunk dot's operand.
    def body(carry, ci):
        m_run, s_run, gold = carry
        start = jnp.minimum(ci * chunk, max(V - chunk, 0))
        w_c = jax.lax.dynamic_slice_in_dim(w, start, chunk, axis=1)
        if use_int8:
            from koifish_tpu.ops.int8_train import int8_matmul
            logits = int8_matmul(x2, w_c, False).astype(jnp.float32)
        else:
            logits = jnp.dot(x2, w_c, preferred_element_type=jnp.float32)
        # suppress columns already counted by the previous chunk (the
        # clamped tail chunk overlaps it when chunk does not divide V)
        vpos = start + jnp.arange(chunk)
        logits = jnp.where(vpos[None, :] >= ci * chunk, logits, -1e30)
        m_new = jnp.maximum(m_run, logits.max(-1))
        s_run = s_run * jnp.exp(m_run - m_new) + \
            jnp.exp(logits - m_new[:, None]).sum(-1)
        # gold logit if target falls into this chunk's fresh columns
        local = tgt - start
        in_chunk = (tgt >= ci * chunk) & (local < chunk)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local, 0, chunk - 1)[:, None], axis=1)[:, 0]
        gold = jnp.where(in_chunk, picked, gold)
        return (m_new, s_run, gold), None

    init = (jnp.full((B * T,), -1e30, jnp.float32),
            jnp.zeros((B * T,), jnp.float32),
            jnp.zeros((B * T,), jnp.float32))
    # checkpoint the body: without it autodiff saves every chunk's logits
    # as scan residuals — re-materializing the full [B*T, V] f32 tensor
    (m_run, s_run, gold), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks))
    lse = m_run + jnp.log(jnp.maximum(s_run, 1e-30))
    per_tok = (lse - gold).reshape(B, T)
    if mask is None:
        return per_tok.mean(), per_tok
    mk = mask.astype(jnp.float32)
    denom = jnp.maximum(mk.sum(), 1.0)
    return (per_tok * mk).sum() / denom, per_tok
