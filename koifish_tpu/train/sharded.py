"""Sharded training: put the TrainState on a Mesh and let the jitted step
run SPMD — grads all-reduce over ``dp``, TP collectives over ``tp``, all
inserted by XLA from the input shardings (GSPMD).

New capability vs the single-GPU reference (SURVEY.md §2.7): this is the
DP/TP/FSDP layer the reference's dormant NCCL code never provided.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from koifish_tpu.parallel.sharding import param_specs, shard_params, _fit_spec
from koifish_tpu.quant.qtensor import QTensor
from koifish_tpu.train.optimizer import OptState
from koifish_tpu.train.trainer import TrainState


def shard_train_state(state: TrainState, mesh: Mesh, tp: str = "tp",
                      fsdp: Optional[str] = None) -> TrainState:
    """Distribute params + optimizer moments with TP(/FSDP) layouts;
    scalars/rng replicated. Optimizer moments share the param specs
    (ZeRO-style optimizer sharding comes free with fsdp)."""
    params = shard_params(state.params, mesh, tp, fsdp)
    specs = param_specs(state.params, tp, fsdp)

    def put_like(w, spec):
        if isinstance(spec, QTensor):   # moments of QTensor params don't exist
            return w
        return jax.device_put(w, NamedSharding(mesh, _fit_spec(w.shape, spec, mesh)))

    def put_tree(tree):
        if tree is None:
            return None
        out = dict(tree)
        out["layers"] = [
            {n: put_like(w, sp[n]) for n, w in lp.items()}
            for lp, sp in zip(tree["layers"], specs["layers"])]
        for k in tree:
            if k != "layers":
                out[k] = put_like(tree[k], specs[k])
        return out

    repl = NamedSharding(mesh, P())
    opt = OptState(m=put_tree(state.opt.m), v=put_tree(state.opt.v),
                   step=jax.device_put(state.opt.step, repl),
                   spikes=jax.device_put(state.opt.spikes, repl))
    return TrainState(params=params, opt=opt,
                      rng=jax.device_put(state.rng, repl))


def shard_batch(batch: dict, mesh: Mesh, dp: str = "dp",
                global_batch: Optional[int] = None) -> dict:
    """[A, B, T] batches: shard the batch axis over dp.

    Multi-host: pass the HOST-LOCAL slice (see
    ``parallel.multihost.per_host_batch_slice``) plus ``global_batch`` —
    the global array is assembled from each process's local data
    (``jax.make_array_from_process_local_data``), so no host ever
    materializes the full batch."""
    out = {}
    for k, v in batch.items():
        spec = _fit_spec(v.shape, P(None, dp, None), mesh)
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() > 1 and global_batch is not None:
            import numpy as np
            gshape = (v.shape[0], global_batch) + tuple(v.shape[2:])
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v), gshape)
        else:
            out[k] = jax.device_put(v, sharding)
    return out
