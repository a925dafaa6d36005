"""Memory planner — how many chips does a model need, and on what mesh?

The reference runs everything on one 24 GB 4090 and answers "does it
fit?" by trial (README.md:23 "Qwen3-32B inference on a single 4090" via
INT4 + HotPicker). On a TPU pod slice the same question becomes a mesh
choice; this module sizes weights / KV / optimizer / activations
analytically and recommends the smallest mesh that fits, so
``bubble --tp`` / ``koifish --dp --tp --fsdp`` can be driven from a
preset name instead of OOM roulette.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

from koifish_tpu.utils.mfu import matmul_params

V5E_HBM = 16 * 1024 ** 3          # bytes per v5e chip
_XLA_RESERVE = 1.2 * 1024 ** 3    # runtime + fragmentation headroom


def param_count(card) -> int:
    """Total parameters (embedding included; tied head counted once)."""
    embed = card.vocab_size * card.n_embd
    P = matmul_params(card) + embed
    if card.tie_embeddings:
        P -= card.vocab_size * card.n_embd   # matmul_params counted the head
    if card.pos_embed == "learned":
        P += card.max_pos * card.n_embd
    return P


@dataclasses.dataclass
class MemoryPlan:
    weights_bytes: int
    kv_bytes: int
    opt_bytes: int            # f32 moments (training only)
    act_bytes: int            # activation estimate at the given batch
    total_bytes: int
    n_chips: int              # smallest power-of-2 chip count that fits
    mesh: Dict[str, int]      # recommended axis sizes
    per_chip_bytes: int

    def summary(self) -> str:
        g = 1024 ** 3
        return (f"weights={self.weights_bytes/g:.1f}G kv={self.kv_bytes/g:.1f}G "
                f"opt={self.opt_bytes/g:.1f}G act={self.act_bytes/g:.1f}G -> "
                f"{self.n_chips} chip(s) {self.mesh}, "
                f"{self.per_chip_bytes/g:.1f}G/chip")


def plan_serving(card, batch: int, ctx: int, weight_bits: int = 4,
                 kv_bits: int = 8, hbm_bytes: int = V5E_HBM,
                 max_chips: int = 256) -> MemoryPlan:
    """Mesh plan for inference: weights TP-sharded, KV sharded over the
    same axis (heads divide), activations replicated per chip."""
    P = param_count(card)
    wb = int(P * weight_bits / 8 * 1.06)    # + scales/zeros overhead
    kvb = int(2 * card.n_layer * batch * card.n_kv_head * ctx *
              card.head_dim * kv_bits / 8 * 1.06)
    act = int(batch * ctx * card.n_embd * 2 * 8)   # ~8 live [B,T,E] bf16
    n = 1
    while n <= max_chips:
        per = (wb + kvb) // n + act + _XLA_RESERVE
        if per <= hbm_bytes and card.n_kv_head % min(n, card.n_kv_head) == 0:
            break
        n *= 2
    mesh = {"tp": n}
    return MemoryPlan(wb, kvb, 0, act, wb + kvb + act, n, mesh,
                      (wb + kvb) // n + act)


def plan_decode(card, batch: int, ctx: int, weight_bits: int = 4,
                kv_bits: int = 8, n_chips: int = 1,
                hbm_bytes: int = V5E_HBM,
                layered: bool = True) -> Dict[str, int]:
    """Per-component decode HBM accounting for ONE batch size — the
    B-scaling story behind the measured sweep walls (round-4 negatives:
    Qwen3-0.6B B=128 INT8-KV OOMed a 16 GB chip, B=64 fit).

    ``layered=True`` (the production path since round 5): caches are
    born per-layer (``cache_for(layered=True)`` / ``init_layered_cache``)
    and prefill donates its cache, so steady state holds ONE copy of the
    KV and the per-step allocation transient is one layer (negligible).
    B=128/S=1024 INT8-KV then fits and was measured at 5661 agg tok/s.

    ``layered=False`` models the legacy stacked→``split_cache`` boundary
    (serve/layered.py — [L, ...] → per-layer leaves) which held BOTH
    copies alive for one step: the admission test must clear
    ``2 x kv_bytes``. At B=128/S=1024 that transient is 2 x 7.7 GB — the
    observed round-4 OOM; B=64 cleared at 2 x 3.9 + 0.5 weights.

    Keys: weights / kv / kv_transient / logits / act / total / fits
    (all bytes, per chip — weights and KV divide over ``n_chips`` of a
    tp mesh)."""
    P = param_count(card)
    wb = int(P * weight_bits / 8 * 1.06) // n_chips
    hd = card.head_dim or card.n_embd // card.n_head
    kv_elem = 2 * card.n_layer * batch * card.n_kv_head * ctx
    kvb = kv_elem * hd * kv_bits // 8
    if kv_bits in (4, 8):
        kvb += kv_elem * 4                    # f32 per-(h, pos) scales
    kvb //= n_chips
    logits = batch * card.vocab_size * 4      # f32 sampling columns
    act = batch * card.n_embd * 2 * 16        # [B, 1, E] working set
    transient = kvb // card.n_layer if layered else kvb
    total = wb + kvb + transient + logits + act + _XLA_RESERVE
    return {"weights": wb, "kv": kvb, "kv_transient": transient,
            "logits": logits, "act": act, "total": total,
            "fits": total <= hbm_bytes}


def plan_training(card, batch: int, ctx: int, remat="dots",
                  hbm_bytes: int = V5E_HBM, max_chips: int = 256,
                  optimizer: str = "adamw",
                  moment_dtype: str = "f32") -> MemoryPlan:
    """Mesh plan for training: bf16 params + moments FSDP-sharded,
    batch DP-sharded. ``remat`` scales the activation estimate the same
    way models/transformer.py interprets it (True=full per-layer
    checkpoint, "dots"=GEMM outputs resident, False=everything).
    ``moment_dtype="bf16"`` matches TrainCard.moment_dtype (the shipped
    774M/1558M recipe) — halves optimizer-state bytes."""
    P = param_count(card)
    wb = P * 2                                   # bf16 params
    n_moments = 2 if optimizer == "adamw" else 1  # muon: momentum only
    ob = P * (2 if moment_dtype == "bf16" else 4) * n_moments
    # per-layer resident activations per token (bytes, bf16):
    E, F = card.n_embd, card.n_ffn
    q = card.n_head * card.head_dim
    kv = card.n_kv_head * card.head_dim
    full = (2 * E                      # block input + post-attn residual
            + q + 2 * kv + q           # qkv + attn out
            + 3 * F + E) * 2           # gate/up/act + down
    per_tok = {True: 2 * E * 2,        # just the carried residual
               "dots": (2 * E + q + 2 * kv + q + 2 * F + E) * 2,
               False: full}[remat]
    act = int(batch * ctx * card.n_layer * per_tok
              + batch * ctx * E * 2 * 8)         # + head/CE working set
    n = 1
    while n <= max_chips:
        # params/moments shard over fsdp, activations over dp (batch)
        dp = min(n, batch)
        per = (wb + ob) // n + act // dp + _XLA_RESERVE
        if per <= hbm_bytes:
            break
        n *= 2
    # grads live at param size during the step; folded into reserve for
    # donated-buffer steps, counted when they don't fit
    dp = min(n, batch)
    mesh = {"dp": dp, "fsdp": n // dp} if n > 1 else {"dp": 1}
    return MemoryPlan(wb, 0, ob, act, wb + ob + act, n, mesh,
                      (wb + ob) // n + act // dp)
