"""Salmon — masked-diffusion ("scoring") language model.

Rebuild of the reference's Salmon arch (src/Transformer/Salmon.cpp;
class decl src/Manifold/gLLM.hpp:328-340; XI_CARD mask config
src/CLI_params.hpp:413-421). The reference targets open-dcoder-0.5B —
the masked-diffusion LM family (LLaDA-style): bidirectional attention
(``isCausalMask = false``, Salmon.cpp:36) over sequences where a random
fraction of tokens is replaced by a mask token, trained to reconstruct
the originals.

TPU-native formulation (all static shapes, jit-clean):

- training: per sequence draw t ~ U(eps, 1), mask each position
  independently with prob t, loss = CE over masked positions weighted
  1/t (the discrete-diffusion ELBO weighting).
- generation: start fully masked after the prompt, run S denoise steps;
  each step predicts all positions, keeps the highest-confidence
  fraction according to a linear unmask schedule, remasks the rest
  (confidence-based remasking).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.models.transformer import model_forward


@dataclasses.dataclass
class XICard:
    """Diffusion config (XI_CARD analog, CLI_params.hpp:413-421)."""
    mask_seed: int = 20260713      # reference default
    timesteps: int = 16            # denoise steps at generation
    eps: float = 1e-3              # min mask ratio

    @classmethod
    def from_json(cls, j: Dict[str, Any]) -> "XICard":
        return cls(mask_seed=int(j.get("mask_seed", 20260713)),
                   timesteps=int(j.get("timesteps", 16)),
                   eps=float(j.get("eps", 1e-3)))


def mask_id(card: ModelCard) -> int:
    return card.mask_token_id if card.mask_token_id >= 0 \
        else card.vocab_size - 1


def diffusion_loss(card: ModelCard, params, tokens: jax.Array,
                   key: jax.Array, xi: Optional[XICard] = None,
                   loss_mask: Optional[jax.Array] = None,
                   ) -> Tuple[jax.Array, jax.Array]:
    """Masked-diffusion ELBO loss over [B, T] tokens.

    Returns (loss, per-position CE * mask). ``loss_mask`` restricts which
    positions may be masked/scored (SFT: assistant spans only).
    """
    xi = xi or XICard()
    B, T = tokens.shape
    k_t, k_m = jax.random.split(key)
    t = jax.random.uniform(k_t, (B, 1), minval=xi.eps, maxval=1.0)
    masked = jax.random.uniform(k_m, (B, T)) < t
    if loss_mask is not None:
        masked = jnp.logical_and(masked, loss_mask)
    noisy = jnp.where(masked, mask_id(card), tokens)

    logits = model_forward(card, params, noisy, logits_dtype=jnp.bfloat16)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    ce = -tok_lp * masked                        # CE only on masked slots
    # ELBO weighting: 1/t per sequence, normalized per masked token
    w = 1.0 / t
    n_masked = jnp.maximum(jnp.sum(masked), 1)
    loss = jnp.sum(ce * w) / (jnp.sum(masked * w) + 1e-9)
    per = ce
    del n_masked
    return loss, per


def diffusion_generate(card: ModelCard, params, prompt: jax.Array,
                       total_len: int, key: jax.Array,
                       steps: int = 16, temperature: float = 0.0,
                       ) -> jax.Array:
    """Iterative unmasking: [B, P] prompt → [B, total_len] sequence.

    Linear schedule: after step s, keep the top (s+1)/steps fraction of
    positions by model confidence; the rest stay masked.
    """
    B, P = prompt.shape
    assert P < total_len
    mid = mask_id(card)
    gen_len = total_len - P
    x0 = jnp.concatenate(
        [prompt, jnp.full((B, gen_len), mid, jnp.int32)], axis=1)
    is_prompt = jnp.arange(total_len)[None, :] < P

    def step_fn(s, carry):
        x, key = carry
        key, k_s = jax.random.split(key)
        logits = model_forward(card, params, x, logits_dtype=jnp.bfloat16)
        logits = logits.astype(jnp.float32)
        if temperature > 0:
            pred = jax.random.categorical(k_s, logits / temperature, axis=-1)
        else:
            pred = jnp.argmax(logits, axis=-1)
        pred = pred.astype(jnp.int32)
        conf = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)  # [B, T]
        # prompt positions are fixed; already-unmasked stay
        still_masked = x == mid
        conf = jnp.where(still_masked, conf, jnp.inf)
        # number of generated positions that must be unmasked after step s
        n_keep = ((s + 1) * gen_len) // steps
        # rank confidence among generated slots; unmask the top n_keep
        conf_gen = jnp.where(is_prompt, jnp.inf, conf)
        order = jnp.argsort(-conf_gen, axis=-1)         # high conf first
        rank = jnp.argsort(order, axis=-1)
        unmask = rank < (P + n_keep)
        new_x = jnp.where(jnp.logical_and(still_masked, unmask), pred, x)
        return new_x, key

    x, _ = jax.lax.fori_loop(0, steps, step_fn, (x0, key))
    # any residual masks (rounding) resolve greedily in one final pass
    logits = model_forward(card, params, x, logits_dtype=jnp.bfloat16)
    pred = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
    return jnp.where(x == mid, pred, x)
