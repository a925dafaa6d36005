"""Device mesh construction.

The reference has NO multi-device execution (SURVEY.md §2.7: vendored
NCCL/MPI code never compiled) — this subsystem is new capability, built
the TPU way: a ``jax.sharding.Mesh`` with named axes

- ``dp``  — data parallel (outer, DCN-friendly across hosts)
- ``tp``  — tensor parallel (inner, rides ICI within a slice)

Layouts put ``tp`` innermost so TP collectives stay on ICI and only DP
gradient reductions cross DCN (scaling-book recipe).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, tp: Optional[int] = None) -> Dict[str, int]:
    """Pick a (dp, tp) factorization. Defaults: tp = min(n, 4) when it
    divides n (v5e ICI-friendly), rest data-parallel."""
    if tp is None:
        # cap tp at 4 so n>=8 also gets dp>=2 — exercises DP gradient psum
        # and FSDP resharding, not just TP (a dp=1 mesh is degenerate)
        tp = 1
        for cand in (4, 2):
            if n_devices % cand == 0 and cand <= n_devices:
                tp = cand
                break
    assert n_devices % tp == 0
    return {"dp": n_devices // tp, "tp": tp}


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = axes or mesh_shape_for(len(devices))
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, names)
