"""Training checkpoints — save/resume with params, optimizer moments,
step counter and RNG seeds in one self-describing safetensors file.

The analog of the reference's ``.ckp`` STATE format (layout
``[data|gama|m|v]`` per tensor + snapshot JSON of iter/seeds,
src/Device/CUDA/huTensor.cu:501-515, Fish::UpdateCheckPoint
Fish.cpp:445-458) — here one flat safetensors with structured names
(``params/layers.3.q``, ``opt_m/...``) and the config snapshot embedded
in ``__metadata__`` (the ``.kun`` self-describing trick,
Safetensors.hpp:92-119).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.config import ModelCard
from koifish_tpu.io.safetensors import read_safetensors, write_safetensors
from koifish_tpu.quant.qtensor import QTensor
from koifish_tpu.train.optimizer import OptState
from koifish_tpu.train.trainer import TrainState


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if node is None:
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}.{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}.{i}")
        elif isinstance(node, QTensor):
            rec(node.codes, path + ".__codes")
            rec(node.scales, path + ".__scales")
            if node.zeros is not None:
                rec(node.zeros, path + ".__zeros")
        else:
            out[f"{prefix}/{path}"] = np.asarray(node)

    rec(tree, "")
    return out


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str):
    """Rebuild a tree with ``template``'s structure from flat arrays."""

    def rec(node, path):
        if node is None:
            return None
        if isinstance(node, dict):
            return {k: rec(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [rec(v, f"{path}.{i}") for i, v in enumerate(node)]
        if isinstance(node, QTensor):
            zeros = None
            if node.zeros is not None:
                zeros = jnp.asarray(flat[f"{prefix}/{path}.__zeros"])
            return QTensor(
                codes=jnp.asarray(flat[f"{prefix}/{path}.__codes"]),
                scales=jnp.asarray(flat[f"{prefix}/{path}.__scales"]),
                zeros=zeros, fmt=node.fmt, shape=node.shape, group=node.group)
        arr = flat[f"{prefix}/{path}"]
        return jnp.asarray(arr).astype(node.dtype)

    return rec(template, "")


def save_train_state(path: str, state: TrainState,
                     card: Optional[ModelCard] = None,
                     extra_meta: Optional[Dict[str, Any]] = None) -> None:
    tensors: Dict[str, np.ndarray] = {}
    tensors.update(_flatten(state.params, "params"))
    tensors.update(_flatten(state.opt.m, "opt_m"))
    if state.opt.v is not None:
        tensors.update(_flatten(state.opt.v, "opt_v"))
    tensors["opt/step"] = np.asarray(state.opt.step)
    tensors["opt/spikes"] = np.asarray(state.opt.spikes)
    tensors["rng"] = np.asarray(jax.random.key_data(state.rng)
                                if jnp.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
                                else state.rng)
    meta = {"format": "koifish_tpu.ckpt.v1"}
    if card is not None:
        meta["model_card"] = json.dumps(dataclasses.asdict(card))
    if extra_meta:
        meta.update({k: json.dumps(v) for k, v in extra_meta.items()})
    write_safetensors(path, tensors, metadata=meta)


def load_train_state(path: str, template: TrainState,
                     ) -> Tuple[TrainState, Dict[str, str]]:
    flat, meta = read_safetensors(path)
    params = _unflatten_into(template.params, flat, "params")
    m = _unflatten_into(template.opt.m, flat, "opt_m")
    v = None
    if template.opt.v is not None:
        v = _unflatten_into(template.opt.v, flat, "opt_v")
    opt = OptState(m=m, v=v,
                   step=jnp.asarray(flat["opt/step"]),
                   spikes=jnp.asarray(flat["opt/spikes"]))
    rng = jnp.asarray(flat["rng"]).astype(jnp.uint32)
    return TrainState(params=params, opt=opt, rng=rng), meta


def save_model(path: str, params: Any, card: Optional[ModelCard] = None,
               ) -> None:
    """Inference-only single-file export (.kun BEST/FULL analog): params
    (incl. packed QTensors) + embedded model card."""
    tensors = _flatten(params, "params")
    meta = {"format": "koifish_tpu.model.v1"}
    if card is not None:
        meta["model_card"] = json.dumps(dataclasses.asdict(card))
    write_safetensors(path, tensors, metadata=meta)


def load_model(path: str, template_params: Any) -> Any:
    flat, _ = read_safetensors(path)
    return _unflatten_into(template_params, flat, "params")


def load_model_card(path: str) -> Optional[ModelCard]:
    from koifish_tpu.io.safetensors import read_header
    header, _ = read_header(path)
    meta = header.get("__metadata__", {})
    if "model_card" in meta:
        d = json.loads(meta["model_card"])
        if d.get("rope_scaling"):
            d["rope_scaling"] = tuple(tuple(x) for x in d["rope_scaling"])
        return ModelCard(**d)
    return None
