"""Model-FLOPs-utilization reporting — §5.1 profiling parity.

The reference prints per-phase timers (``SUM``, GST_util.hpp:178-198);
under XLA the step is one fused executable, so the actionable single
number is MFU: analytic model FLOPs / step time / chip peak. The PaLM
convention is used (matmul FLOPs = 6 x params-touched x tokens for a
train step, + the attention quadratic term; embedding gather excluded).
"""
from __future__ import annotations

from typing import Optional

import jax

# bf16 peak matmul throughput, FLOP/s.  Keyed by substrings of
# jax.devices()[0].device_kind.
_PEAK_FLOPS = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6 lite": 918e12,  # trillium
    "v6e": 918e12,
    "v3": 123e12,
    "v2": 45e12,
}


def chip_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of the current chip, or None when unknown (CPU)."""
    try:
        d = device or jax.devices()[0]
        kind = d.device_kind.lower()
    except Exception:  # pragma: no cover
        return None
    for key, peak in _PEAK_FLOPS.items():
        if key in kind:
            return peak
    return None


def matmul_params(card) -> int:
    """Parameters that participate in matmuls (embedding gather excluded;
    the tied/untied head IS a matmul so the E*V block counts once)."""
    E, L = card.n_embd, card.n_layer
    q = card.n_head * card.head_dim
    kv = card.n_kv_head * card.head_dim
    attn = E * q + 2 * E * kv + q * E
    if getattr(card, "n_experts", 0):
        # only the routed top-k experts touch each token
        ffn_e = 3 * E * (card.moe_ffn or card.n_ffn)
        ffn = ffn_e * max(getattr(card, "n_experts_active", 1), 1)
        ffn += E * card.n_experts  # router
    else:
        n_mats = 3 if card.act in ("silu", "swiglu") else 2
        ffn = n_mats * E * card.n_ffn
    head = E * card.vocab_size
    return L * (attn + ffn) + head


def train_step_flops(card, n_tokens: int) -> float:
    """Analytic matmul FLOPs of one train step over ``n_tokens`` tokens:
    fwd (2PT) + bwd (4PT) + the attention quadratic term (causal halves
    the T^2 score/AV work; x3 for its bwd)."""
    P = matmul_params(card)
    dense = 6.0 * P * n_tokens
    # 2 dots (QK^T, AV) x 2*D FLOPs per (query, key) pair, causal T/2 keys
    attn_fwd = 2 * card.n_layer * n_tokens * 2 * (card.n_ctx / 2) * \
        (card.n_head * card.head_dim)
    return dense + 3.0 * attn_fwd


def step_mfu(card, n_tokens: int, dt: float) -> Optional[float]:
    """MFU in [0,1] for one train step, or None off-TPU."""
    peak = chip_peak_flops()
    if not peak or dt <= 0:
        return None
    return train_step_flops(card, n_tokens) / dt / peak
