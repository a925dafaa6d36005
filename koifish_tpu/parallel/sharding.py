"""Partition specs for params / optimizer state / batches.

Megatron-style TP layout, expressed as jax.sharding PartitionSpecs and
left to XLA to realize with ICI collectives (scaling-book recipe —
SURVEY.md §2.7 "TPU-native plan"):

- column-parallel: q/k/v, gate/up, lm head  → shard OUT features on ``tp``
- row-parallel:    o, down                  → shard IN  features on ``tp``
- embeddings: shard vocab on ``tp``
- norms/biases of row-parallel outputs: replicated
- optional FSDP: additionally shard the non-tp axis of big matrices on
  ``dp`` (ZeRO-3 analog; the reference's ZeRO enum is dormant,
  multi_gpu.cuh:67-72)

QTensor leaves (codes/scales/zeros) share their parent weight's [in, out]
orientation, so the same rule applies to each field.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from koifish_tpu.quant.qtensor import QTensor

# param-name -> (in_axis_shard, out_axis_shard); None = replicated axis
_COL = {"q", "k", "v", "gate", "up", "fc", "head"}      # shard axis -1
_ROW = {"o", "down", "proj"}                            # shard axis 0
_COL_BIAS = {"q_b", "k_b", "v_b", "fc_b"}               # shard axis 0 (out features)


def _spec_for_matrix(name: str, tp: str, fsdp: Optional[str]) -> P:
    if name in _COL:
        return P(fsdp, tp) if fsdp else P(None, tp)
    if name in _ROW:
        return P(tp, fsdp) if fsdp else P(tp, None)
    if name == "wte":   # [V, E] plain — vocab sharded
        return P(tp, fsdp) if fsdp else P(tp, None)
    return P(None, None)


def _qtensor_specs(name: str, qt: QTensor, tp: str, fsdp: Optional[str]) -> QTensor:
    """Spec 'QTensor' mirroring the leaf structure."""
    base = _spec_for_matrix(name if name != "wte" else "head", tp, fsdp)
    zeros = base if qt.zeros is not None else None
    return QTensor(codes=base, scales=base, zeros=zeros, fmt=qt.fmt,
                   shape=qt.shape, group=qt.group)


def param_specs(params: Dict[str, Any], tp: str = "tp",
                fsdp: Optional[str] = None) -> Dict[str, Any]:
    """Same-structure tree of PartitionSpec for a transformer param tree."""

    def spec_leaf(name: str, w):
        if isinstance(w, QTensor):
            return _qtensor_specs(name, w, tp, fsdp)
        if getattr(w, "ndim", 0) == 3 and name in ("egate", "eup", "edown"):
            # expert parallelism: stacked expert axis over tp (ICI)
            return P(tp, None, None)
        if getattr(w, "ndim", 0) == 2:
            if name in ("wpe", "router"):
                return P(None, None)
            return _spec_for_matrix(name, tp, fsdp)
        if getattr(w, "ndim", 0) == 1 and name in _COL_BIAS:
            return P(tp)
        return P(*(None,) * getattr(w, "ndim", 0))

    out: Dict[str, Any] = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = [{n: spec_leaf(n, w) for n, w in lp.items()} for lp in v]
        else:
            out[k] = spec_leaf(k, v)
    return out


def batch_spec(dp: str = "dp") -> P:
    """[（accum,) B, T] batches: shard batch dim on dp."""
    return P(None, dp, None)


def shard_params(params, mesh: Mesh, tp: str = "tp",
                 fsdp: Optional[str] = None):
    """device_put the param tree with TP(/FSDP) NamedShardings. Axes that
    don't divide evenly fall back to replicated (guarded per leaf)."""
    specs = param_specs(params, tp, fsdp)

    def put(w, spec):
        if isinstance(w, QTensor):
            return QTensor(
                codes=put(w.codes, spec.codes),
                scales=put(w.scales, spec.scales),
                zeros=put(w.zeros, spec.zeros) if w.zeros is not None else None,
                fmt=w.fmt, shape=w.shape, group=w.group,
                # learned codebooks / Sinkhorn row factors ride along
                # REPLICATED (tiny; activations-side fold reads them on
                # every shard) — dropping them silently re-decoded
                # cluster tensors with the global NF constants
                codebook=(put(w.codebook, P(*(None,) * w.codebook.ndim))
                          if w.codebook is not None else None),
                row_scale=(put(w.row_scale, P(None))
                           if w.row_scale is not None else None))
        spec = _fit_spec(w.shape, spec, mesh)
        return jax.device_put(w, NamedSharding(mesh, spec))

    out = dict(params)
    out["layers"] = [
        {n: put(w, s) for (n, w), s in zip(lp.items(), sp.values())}
        for lp, sp in zip(params["layers"], specs["layers"])]
    for k in params:
        if k != "layers":
            out[k] = put(params[k], specs[k])
    return out


def _fit_spec(shape, spec: P, mesh: Mesh) -> P:
    """Drop axis shardings that don't divide the dimension evenly."""
    fixed = []
    for dim, ax in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if ax is None:
            fixed.append(None)
            continue
        axes = ax if isinstance(ax, tuple) else (ax,)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        fixed.append(ax if dim % n == 0 else None)
    return P(*fixed)


def shard_cache(cache, mesh: Mesh, tp: str = "tp", dp: Optional[str] = None):
    """Distribute a KVCache: KV heads over ``tp`` (matches column-parallel
    k/v projections, so cache writes and decode attention stay local to
    the head shard), optional batch over ``dp``. [L, B, H, S, D] layout."""
    import dataclasses as _d

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, _fit_spec(x.shape, spec,
                                                               mesh)))

    kv = P(None, dp, tp, None, None)
    sc = P(None, dp, tp, None)
    return _d.replace(
        cache,
        k=put(cache.k, kv), v=put(cache.v, kv),
        k_scale=put(cache.k_scale, sc), v_scale=put(cache.v_scale, sc),
        pos=put(cache.pos, P(dp)))


def constrain_activations(x, mesh: Mesh, dp: str = "dp"):
    """Activation constraint [B, T, E] → batch on dp (used inside sharded
    steps to anchor XLA's propagation)."""
    spec = P(dp, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
