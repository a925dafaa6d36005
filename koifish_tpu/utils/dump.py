"""Structure / debug dumps — DUMP_SWITCH analogs (CLI_params.hpp:720-726).

``nn_structure`` in the reference prints the neuron tree at startup
(Fish::Dump). Here the model IS the param pytree, so the dump is the
pytree: one line per leaf with shape/dtype/bytes, repeated layers
collapsed to "layer.0 ... x N".
"""
from __future__ import annotations

from typing import Any, List

import jax
import numpy as np


def _leaf_line(path: str, leaf: Any) -> str:
    shape = tuple(getattr(leaf, "shape", ()))
    dtype = getattr(leaf, "dtype", type(leaf).__name__)
    size = int(np.prod(shape)) if shape else getattr(leaf, "size", 0)
    nbytes = size * getattr(getattr(leaf, "dtype", None), "itemsize", 1)
    return f"  {path:<40s} {str(shape):<24s} {str(dtype):<10s} " \
           f"{nbytes / 1e6:8.2f} MB"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def model_structure(params: Any) -> str:
    """Param-tree structure dump: layer 0 in full, layers 1.. collapsed."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    lines: List[str] = []
    n_layers = 0
    total_bytes = 0
    total_params = 0
    for path, leaf in leaves:
        ps = _path_str(path)
        shape = tuple(getattr(leaf, "shape", ()))
        size = int(np.prod(shape)) if shape else 0
        total_params += size
        total_bytes += size * getattr(getattr(leaf, "dtype", None),
                                      "itemsize", 1)
        if ps.startswith("layers."):
            idx = ps.split(".")[1]
            if idx == "0":
                lines.append(_leaf_line(ps, leaf))
            n_layers = max(n_layers, int(idx) + 1)
        else:
            lines.append(_leaf_line(ps, leaf))
    if n_layers > 1:
        lines.append(f"  ... x {n_layers} layers")
    lines.append(f"  total: {total_params / 1e6:.1f}M params, "
                 f"{total_bytes / 1e9:.2f} GB")
    return "\n".join(lines)
