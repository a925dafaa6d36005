"""Low-rank weight compression — the lenda/LoSVD analog.

The reference ships a randomized SVD (lenda/kernel/SVD_r.cpp:898) used
by SparseNeuron's low-rank compression option (Neuron.hpp:306). On TPU
the factorization itself is one `jnp.linalg.svd` call; the product
value is the compressed matmul: ``x @ W ≈ (x @ A) @ B`` with
``A [in, r]``, ``B [r, out]`` — 2·r·(in+out) FLOPs/token instead of
2·in·out, a win when r < in·out/(in+out).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def svd_compress(w: jax.Array, rank: Optional[int] = None,
                 energy: float = 0.95) -> Tuple[jax.Array, jax.Array]:
    """Factor ``w [in, out]`` into ``A [in, r] @ B [r, out]``.

    ``rank``: explicit target rank; otherwise the smallest r capturing
    ``energy`` of the squared spectral mass (the LoSVD default mode).
    Returns bf16 factors; reconstruct with ``A @ B``."""
    wf = w.astype(jnp.float32)
    u, s, vt = jnp.linalg.svd(wf, full_matrices=False)
    if rank is None:
        e = jnp.cumsum(s ** 2) / jnp.sum(s ** 2)
        rank = int(jnp.searchsorted(e, energy)) + 1
    rank = max(1, min(rank, s.shape[0]))
    a = (u[:, :rank] * s[:rank][None, :]).astype(jnp.bfloat16)
    b = vt[:rank].astype(jnp.bfloat16)
    return a, b


def lowrank_error(w: jax.Array, a: jax.Array, b: jax.Array) -> float:
    """Relative Frobenius reconstruction error."""
    wf = w.astype(jnp.float32)
    rec = a.astype(jnp.float32) @ b.astype(jnp.float32)
    return float(jnp.linalg.norm(wf - rec) / (jnp.linalg.norm(wf) + 1e-12))
