"""Knowledge distillation — teacher-logits KD with annealed mixing.

Rebuild of the reference's Fuzi distillation scaffolding
(src/Fuzi/Distillation.{hpp,cpp}: teacher-logits distillation + sigma
annealing ``UpdateSigma``). Loss = (1-σ)·CE(student, labels) +
σ·T²·KL(teacher_T ‖ student_T), σ annealed over training.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.models import model_forward
from koifish_tpu.ops.cross_entropy import cross_entropy_loss


@dataclasses.dataclass
class DistillSchedule:
    """σ annealing (UpdateSigma analog): start strong on the teacher,
    hand over to the hard labels."""
    sigma0: float = 0.9
    sigma1: float = 0.1
    total_steps: int = 1000
    kind: str = "cosine"       # cosine | linear | static

    def sigma(self, step) -> jax.Array:
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(self.total_steps, 1),
                     0.0, 1.0)
        if self.kind == "static":
            return jnp.asarray(self.sigma0)
        if self.kind == "linear":
            return self.sigma0 + (self.sigma1 - self.sigma0) * t
        return self.sigma1 + 0.5 * (self.sigma0 - self.sigma1) * \
            (1 + jnp.cos(jnp.pi * t))


def kd_loss(student_logits: jax.Array, teacher_logits: jax.Array,
            temperature: float = 2.0,
            mask: Optional[jax.Array] = None) -> jax.Array:
    """T²-scaled KL(teacher ‖ student) per masked token mean."""
    sl = student_logits.astype(jnp.float32) / temperature
    tl = teacher_logits.astype(jnp.float32) / temperature
    t_prob = jax.nn.softmax(tl, axis=-1)
    s_logp = jax.nn.log_softmax(sl, axis=-1)
    t_logp = jax.nn.log_softmax(tl, axis=-1)
    kl = jnp.sum(t_prob * (t_logp - s_logp), axis=-1)   # [B, T]
    kl = kl * temperature ** 2
    if mask is None:
        return kl.mean()
    m = mask.astype(jnp.float32)
    return (kl * m).sum() / jnp.maximum(m.sum(), 1.0)


def distill_step_loss(card: ModelCard, params, teacher_card: ModelCard,
                      teacher_params, tokens, step,
                      schedule: DistillSchedule, temperature: float = 2.0,
                      loss_mask=None, remat: bool = False):
    """Combined loss for one batch; teacher runs under stop_gradient."""
    s_logits = model_forward(card, params, tokens[:, :-1], remat=remat)
    t_logits = jax.lax.stop_gradient(
        model_forward(teacher_card, teacher_params, tokens[:, :-1]))
    mask = loss_mask[:, 1:] if loss_mask is not None else None
    ce, _ = cross_entropy_loss(s_logits, tokens[:, 1:], mask)
    kd = kd_loss(s_logits, t_logits, temperature, mask)
    sigma = schedule.sigma(step)
    return (1.0 - sigma) * ce + sigma * kd, {"ce": ce, "kd": kd,
                                             "sigma": sigma}
