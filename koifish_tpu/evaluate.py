"""Evaluation: perplexity over token shards + HellaSwag accuracy.

Analog of the reference's eval path (``SampLoader::Evaluate`` →
``LossOnResult`` per-token CE → PPL = exp(mean CE),
src/TokenSet/TokenSet.cpp:392-601; HellaSwag per-completion masked loss
argmin vs label, TokenSet.cpp:480-516, ``pangpi`` binary).
"""
from __future__ import annotations

import functools
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard
from koifish_tpu.models import model_forward
from koifish_tpu.ops.cross_entropy import cross_entropy_loss


@functools.partial(jax.jit, static_argnames=("card",))
def _batch_ce(card: ModelCard, params, tokens, mask):
    logits = model_forward(card, params, tokens[:, :-1])
    loss, per_tok = cross_entropy_loss(logits, tokens[:, 1:], mask[:, 1:])
    return (per_tok * mask[:, 1:]).sum(), mask[:, 1:].sum()


def perplexity(card: ModelCard, params, batches: Iterable[dict],
               max_batches: int = 0) -> Tuple[float, float]:
    """Returns (mean_ce, ppl) over an iterator of {"tokens": [A,B,T+1]}."""
    tot, cnt = 0.0, 0.0
    for i, b in enumerate(batches):
        if max_batches and i >= max_batches:
            break
        toks = jnp.asarray(b["tokens"]).reshape(-1, b["tokens"].shape[-1])
        mask = b.get("loss_mask")
        mask = (jnp.asarray(mask).reshape(toks.shape).astype(jnp.float32)
                if mask is not None else jnp.ones_like(toks, jnp.float32))
        s, n = _batch_ce(card, params, toks, mask)
        tot += float(s)
        cnt += float(n)
    ce = tot / max(cnt, 1.0)
    return ce, float(np.exp(ce))


@functools.partial(jax.jit, static_argnames=("card",))
def _option_losses(card: ModelCard, params, tokens, mask):
    """tokens [4, T+1], mask [4, T+1] → mean masked CE per option."""
    logits = model_forward(card, params, tokens[:, :-1])
    _, per_tok = cross_entropy_loss(logits, tokens[:, 1:],
                                    mask[:, 1:].astype(jnp.float32))
    m = mask[:, 1:].astype(jnp.float32)
    return (per_tok * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)


def hellaswag_accuracy(card: ModelCard, params,
                       samples: Iterable, seq_len: int = 0,
                       max_samples: int = 0) -> float:
    """samples: iterable of (label, [4 x (tokens, completion_mask)])."""
    seq_len = seq_len or card.n_ctx
    correct = total = 0
    for label, options in samples:
        if max_samples and total >= max_samples:
            break
        T = seq_len + 1
        toks = np.zeros((4, T), np.int32)
        mask = np.zeros((4, T), bool)
        for i, (t, m) in enumerate(options):
            n = min(len(t), T)
            toks[i, :n] = t[:n]
            mask[i, :n] = m[:n]
        losses = _option_losses(card, params, jnp.asarray(toks),
                                jnp.asarray(mask))
        correct += int(int(jnp.argmin(losses)) == label)
        total += 1
    return correct / max(total, 1)
