"""Fuyou — evolutionary optimization of experts (EOE, arXiv:2509.24436).

Rebuild of the reference's Fuyou scheduler (src/Manifold/Scheduler.hpp:
193-243, Scheduler.cpp:385-660; PSO/mutation/crossover kernels
operator.cuh:340-391): an "expert" is a **layer-range branch** — a swarm
of K candidate weight-sets for a slice of layers is trained alternately,
and every ``switch`` iterations the swarm is exploited with PSO and/or
genetic crossover+mutation toward the best-scoring branch.

TPU-native shape: branches live as stacked host-side pytrees; injection
swaps a branch into the live TrainState (pure tree surgery), and the
exploitation update is a handful of jitted lerp/where ops — no custom
kernels needed (the reference's CU_PSO_2D etc. are elementwise).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FuyouConfig:
    branches: int = 4
    switch: int = 100            # iterations per branch before rotating
    method: str = "pso_ga"       # pso | ga | mix | pso_ga
    crossover: float = 0.6
    mutation: float = 0.001
    social: float = 2.0          # PSO social coefficient
    inertia: float = 0.7
    layer_lo: int = 0            # branch layer range [lo, hi)
    layer_hi: int = -1           # -1 = all layers

    @classmethod
    def from_json(cls, j: Dict[str, Any]) -> "FuyouConfig":
        return cls(branches=int(j.get("branch", 4)),
                   switch=int(j.get("switch", 100)),
                   method=str(j.get("method", "pso_ga")),
                   crossover=float(j.get("crossover", 0.6)),
                   mutation=float(j.get("mutation", 0.001)),
                   social=float(j.get("social", 2.0)))


def _copy_tree(t):
    """Deep copy of buffers — branch stores must not alias TrainState
    buffers, which get donated (invalidated) by every jitted step."""
    return jax.tree_util.tree_map(jnp.copy, t)


def _slice_layers(params, lo, hi):
    return [dict(lp) for lp in params["layers"][lo:hi]]


@jax.jit
def _pso_step(branch, best, velocity, *, key, inertia, social):
    """v ← w·v + c·r·(best − x);  x ← x + v   (CU_PSO_2D analog)."""
    leaves, treedef = jax.tree_util.tree_flatten(branch)
    b_leaves = treedef.flatten_up_to(best)
    v_leaves = treedef.flatten_up_to(velocity)
    keys = jax.random.split(key, len(leaves))
    out_x, out_v = [], []
    for x, b, v, k in zip(leaves, b_leaves, v_leaves, keys):
        r = jax.random.uniform(k, x.shape)
        vf = inertia * v + social * r * (b.astype(jnp.float32)
                                         - x.astype(jnp.float32))
        out_v.append(vf)
        out_x.append((x.astype(jnp.float32) + vf).astype(x.dtype))
    return (jax.tree_util.tree_unflatten(treedef, out_x),
            jax.tree_util.tree_unflatten(treedef, out_v))


@jax.jit
def _ga_step(branch, best, *, key, crossover, mutation):
    """Uniform crossover with the best branch + Gaussian mutation
    (CU_crossover_/CU_mutation_ analogs)."""
    leaves, treedef = jax.tree_util.tree_flatten(branch)
    b_leaves = treedef.flatten_up_to(best)
    keys = jax.random.split(key, 2 * len(leaves))
    out = []
    for i, (x, b) in enumerate(zip(leaves, b_leaves)):
        take = jax.random.uniform(keys[2 * i], x.shape) < crossover
        y = jnp.where(take, b, x)
        noise = jax.random.normal(keys[2 * i + 1], x.shape) * mutation
        out.append((y.astype(jnp.float32) + noise).astype(x.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


class Fuyou:
    """Swarm driver around a TrainState. Usage::

        fy = Fuyou(cfg, state.params)
        params = fy.inject(state.params)           # activate current branch
        ... train `switch` iters, record loss ...
        state, rotated = fy.rotate(state, recent_loss, rng)
    """

    def __init__(self, cfg: FuyouConfig, params):
        self.cfg = cfg
        n_layers = len(params["layers"])
        self.lo = cfg.layer_lo
        self.hi = cfg.layer_hi if cfg.layer_hi > 0 else n_layers
        base = _slice_layers(params, self.lo, self.hi)
        self.branches: List[Any] = [_copy_tree(base)
                                    for _ in range(cfg.branches)]
        self.velocity = [jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), base)
            for _ in range(cfg.branches)]
        self.scores = np.full(cfg.branches, np.inf)
        self.cur = 0
        self.iters_on_cur = 0

    def inject(self, params):
        out = dict(params)
        layers = list(params["layers"])
        layers[self.lo:self.hi] = _copy_tree(self.branches[self.cur])
        out["layers"] = layers
        return out

    def extract(self, params):
        self.branches[self.cur] = _copy_tree(
            _slice_layers(params, self.lo, self.hi))

    @property
    def best(self) -> int:
        return int(np.argmin(self.scores))

    def rotate(self, params, recent_loss: float, key) -> Any:
        """Record the active branch's score, run exploitation, switch to
        the next branch, and return params with it injected
        (ExploreOptimization analog, gLLM.cpp:673-677)."""
        self.extract(params)
        self.scores[self.cur] = recent_loss
        self._exploit(key)
        self.cur = (self.cur + 1) % self.cfg.branches
        return self.inject(params)

    def _exploit(self, key):
        if not np.isfinite(self.scores).any():
            return
        best = self.branches[self.best]
        method = self.cfg.method
        for i in range(self.cfg.branches):
            if i == self.best or not np.isfinite(self.scores[i]):
                continue
            key, k1, k2 = jax.random.split(key, 3)
            if method in ("pso", "pso_ga", "mix"):
                self.branches[i], self.velocity[i] = _pso_step(
                    self.branches[i], best, self.velocity[i], key=k1,
                    inertia=self.cfg.inertia,
                    social=self.cfg.social * 0.01)
            if method in ("ga", "pso_ga", "mix"):
                self.branches[i] = _ga_step(
                    self.branches[i], best, key=k2,
                    crossover=self.cfg.crossover,
                    mutation=self.cfg.mutation)
