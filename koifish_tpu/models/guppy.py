"""Guppy — vocab-memory FFN architecture.

Rebuild of the reference's ``Guppy`` (gLLM.hpp:231-247, gLLMx.cpp:40-48,
SparseNeuron.cpp:151-179): a decoder whose FFN weights are *views of
sampled token-embedding rows* (``SparseNeuron::SetEmbed`` makes the FFN
weight refer to the embedding table; ``Guppy::BeforeNextStep`` calls
``FFN::UpdateSamps(iter*nLayer+l)`` to resample which rows each step).

TPU-native shape: the FFN is a key-value memory over F sampled
embedding rows r = wte[samps] —

    y = gain · gelu(x rᵀ / sqrt(E)) r

Rows resample every training step from the step rng (the reference
seeds a GRander with iter*nLayer+l); gradients flow into the sampled
wte rows through the gather. Evaluation/serving uses the deterministic
seed-0 sample so a trained model is a fixed function.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard


def sample_ids(card: ModelCard, rng: Optional[jax.Array]) -> jax.Array:
    """[L, F] token ids; per-layer fold mirrors the reference's
    iter*nLayer+l seeding (rng is already step-folded by the trainer).
    rng=None -> the fixed evaluation sample."""
    key = rng if rng is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, card.n_layer)
    return jnp.stack([
        jax.random.randint(keys[li], (card.n_ffn,), 0, card.vocab_size,
                           dtype=jnp.int32)
        for li in range(card.n_layer)])


def inject_rows(card: ModelCard, params: Dict[str, Any],
                samps: Optional[jax.Array]) -> Dict[str, Any]:
    """Return params with per-layer ``guppy_rows`` = wte[samps[l]] views
    injected (differentiable gather — wte trains through the FFN).
    No-op when rows are already present. Handles both per-layer-list
    params and layer-stacked params (serve/stacked.py)."""
    if card.arch != "GUPPY":
        return params
    from koifish_tpu.models.transformer import gather_embed
    if samps is None:
        samps = sample_ids(card, None)
    out = dict(params)
    layers = params["layers"]
    if isinstance(layers, list):
        if "guppy_rows" in layers[0]:
            return params
        out["layers"] = [dict(lp, guppy_rows=gather_embed(params["wte"],
                                                          samps[li]))
                         for li, lp in enumerate(layers)]
    else:   # stacked: one [L, F, E] rows leaf rides the scanned dict
        if "guppy_rows" in layers:
            return params
        L, F = samps.shape
        rows = gather_embed(params["wte"], samps.reshape(-1))
        out["layers"] = dict(layers,
                             guppy_rows=rows.reshape(L, F, rows.shape[-1]))
    return out


def guppy_ffn(lp: Dict[str, Any], x: jax.Array) -> jax.Array:
    rows = lp["guppy_rows"].astype(x.dtype)          # [F, E]
    e = rows.shape[-1]
    h = jnp.dot(x, rows.T) * (1.0 / jnp.sqrt(jnp.float32(e)).astype(x.dtype))
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    y = jnp.dot(h, rows)
    return y * lp["guppy_gain"].astype(x.dtype)
