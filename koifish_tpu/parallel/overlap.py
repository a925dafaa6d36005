"""Collective/compute overlap knobs — the TP latency-hiding setup.

On a TPU mesh the per-layer TP pattern is (column-parallel matmul →
row-parallel matmul → all-reduce). XLA can hide the all-reduce under the
next layer's matmuls — and decompose big matmuls around collectives
(the "collective matmul" rewrite) — when the latency-hiding scheduler
is on. On tunneled runtimes XLA_FLAGS never reaches the remote compile
server (and the local client aborts on unknown TPU flags), so the knobs
travel as per-jit ``compiler_options`` instead — every sharded jit site
passes :func:`overlap_compiler_options`.
"""
from __future__ import annotations

from typing import Dict, Optional

_OPTIONS = {
    "xla_tpu_enable_latency_hiding_scheduler": "true",
    # decompose dots feeding/consuming collectives so the transfer rides
    # under the partial matmuls
    "xla_tpu_enable_collective_matmul": "true",
}


def overlap_compiler_options() -> Optional[Dict[str, str]]:
    """The latency-hiding compiler options for sharded executables, or
    None off-TPU (the CPU compiler rejects unknown TPU options)."""
    import jax
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:  # pragma: no cover
        return None
    return dict(_OPTIONS)


def enable_overlap_flags() -> bool:
    """Back-compat shim: the flags now ride per-jit (see module doc)."""
    return overlap_compiler_options() is not None
