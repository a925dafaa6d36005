"""Learning-rate schedules — analog of the reference's ``LearnSKDU``
(STATIC/TRI_LINE/COSINE/COSINE_EPOCH/WSD/FIX, src/Manifold/Scheduler.hpp:25-173).

Pure functions of the integer step so they fold into the jitted update.
"""
from __future__ import annotations

import jax.numpy as jnp


def lr_at(step, *, kind: str = "cosine", base_lr: float, total_steps: int,
          warmup: int = 0, min_ratio: float = 0.1, decay_frac: float = 0.1,
          epoch_steps: int = 0):
    """Returns the lr for ``step`` (traced or python int).

    ``cosine_epoch``: cosine with per-epoch restarts — the step folds
    modulo ``epoch_steps`` (the reference's ``nEpochIter``) and the whole
    schedule (incl. re-warmup) repeats each epoch
    (``LearnSKDU::LearningRate`` COSINE_EPOCH, Scheduler.hpp:62-64 +
    Scheduler.cpp:24-26)."""
    step = jnp.asarray(step, jnp.float32)
    total = max(total_steps, 1)
    if kind == "cosine_epoch":
        total = max(epoch_steps, 1) if epoch_steps else total
        step = jnp.mod(step, total)
    warm = jnp.minimum(step / jnp.maximum(warmup, 1), 1.0) if warmup else 1.0
    min_lr = base_lr * min_ratio

    if kind in ("static", "fix"):
        core = jnp.asarray(base_lr)
    elif kind in ("cosine", "cosine_epoch"):
        t = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
        core = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
    elif kind == "wsd":  # warmup-stable-decay: hold, then linear decay tail
        decay_start = total * (1.0 - decay_frac)
        t = jnp.clip((step - decay_start) / jnp.maximum(total - decay_start, 1),
                     0.0, 1.0)
        core = base_lr - (base_lr - min_lr) * t
    elif kind == "tri_line":  # triangular: up to peak mid-run, back down
        t = jnp.clip(step / total, 0.0, 1.0)
        core = min_lr + (base_lr - min_lr) * (1 - jnp.abs(2 * t - 1))
    else:
        raise ValueError(f"unknown schedule {kind}")
    return core * warm
