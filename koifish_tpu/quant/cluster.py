"""Cluster (k-means) and Sinkhorn-normalized quantization modes.

Rebuild of the reference's GeQuant research quantizers:
- ``Q_Cluster`` — k-means codebook quantization (src/Tensor/GeQuant.hpp:
  255-263; CU_KMeans_* kernels quantizer.cu:396-437): learn a per-tensor
  codebook over absmax-normalized group values instead of a fixed NF
  grid; often beats NF4 on non-Gaussian weight distributions.
- ``SinkNormal`` — Sinkhorn-normalized quantization (GeQuant.hpp:75-77):
  alternately divide rows and columns by their standard deviation to
  minimize matrix imbalance before groupwise quantization; the column
  factors fold into the per-group scales, the row factors ride the
  QTensor (folded into activations at matmul time, ops/matmul.py).

Both produce ordinary QTensors, so the whole serving stack (fused
kernels excepted — codebook tensors take the XLA dequant path) works
unchanged.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.dtypes import DEFAULT_GROUP, QFormat
from koifish_tpu.quant.qtensor import QTensor
from koifish_tpu.quant.rtn import quantize


def _kmeans_1d(x: jax.Array, k: int, iters: int = 12) -> jax.Array:
    """1-D Lloyd's algorithm → sorted codebook [k] (f32). x: flat values."""
    x = x.astype(jnp.float32)
    # quantile init — robust for heavy-tailed weight distributions
    qs = jnp.quantile(x, jnp.linspace(0.005, 0.995, k))
    cents = qs

    def step(cents, _):
        d = jnp.abs(x[:, None] - cents[None, :])        # [N, k]
        assign = jnp.argmin(d, axis=1)
        one = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        count = one.sum(0)
        total = (one * x[:, None]).sum(0)
        new = jnp.where(count > 0, total / jnp.maximum(count, 1), cents)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    return jnp.sort(cents)


def quantize_kmeans(w: jax.Array, bits: int = 4, group: int = DEFAULT_GROUP,
                    iters: int = 12, sample: int = 65536) -> QTensor:
    """Per-tensor learned codebook over absmax-normalized values
    (Q_Cluster analog). bits in (3, 4)."""
    assert bits in (3, 4)
    fmt = QFormat.NF4 if bits == 4 else QFormat.NF3
    k = 1 << bits
    w2 = w.reshape(w.shape[0], -1).astype(jnp.float32)
    G = w2.shape[0] // group
    g = w2.reshape(G, group, -1)
    scale = jnp.maximum(jnp.max(jnp.abs(g), axis=1), 1e-12)     # [G, out]
    normed = (g / scale[:, None, :]).reshape(-1)
    # subsample for the codebook fit (k-means over 100M values is waste)
    if normed.size > sample:
        idx = jax.random.permutation(jax.random.PRNGKey(0),
                                     normed.size)[:sample]
        fit = normed[idx]
    else:
        fit = normed
    book = _kmeans_1d(fit, k, iters)
    # assign codes: nearest codebook entry (sorted book -> searchsorted)
    mids = (book[1:] + book[:-1]) / 2.0
    raw = jnp.searchsorted(mids, normed).reshape(G, group, -1).astype(jnp.uint8)
    from koifish_tpu.quant.packing import pack_codes
    codes = pack_codes(raw.reshape(w2.shape), fmt, group=group)
    return QTensor(codes=codes, scales=scale.astype(jnp.float32),
                   zeros=None, fmt=fmt, shape=tuple(w2.shape), group=group,
                   codebook=book)


def sinkhorn_normalize(w: jax.Array, iters: int = 6,
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Alternately divide rows/columns by their std → (wn, r, c) with
    w = r[:, None] * wn * c[None, :] (SinkNormal, GeQuant.hpp:75-77)."""
    wn = w.astype(jnp.float32)
    r = jnp.ones((w.shape[0],), jnp.float32)
    c = jnp.ones((w.shape[1],), jnp.float32)
    for _ in range(iters):
        rs = jnp.maximum(jnp.std(wn, axis=1), 1e-8)
        wn = wn / rs[:, None]
        r = r * rs
        cs = jnp.maximum(jnp.std(wn, axis=0), 1e-8)
        wn = wn / cs[None, :]
        c = c * cs
    return wn, r, c


def quantize_sinkhorn(w: jax.Array, fmt: QFormat = QFormat.INT4,
                      group: int = DEFAULT_GROUP, iters: int = 6) -> QTensor:
    """Sinkhorn-normalize, quantize the balanced matrix, fold the column
    factors into the group scales and carry the row factors on the
    QTensor (activation-side fold)."""
    wn, r, c = sinkhorn_normalize(w, iters)
    qt = quantize(wn, fmt, group=group)
    import dataclasses
    scales = qt.scales.astype(jnp.float32) * c[None, :]
    return dataclasses.replace(qt, scales=scales, row_scale=r)


def quantize_mini(w: jax.Array, bits: int = 4, group: int = DEFAULT_GROUP,
                  iters: int = 10, row_chunk: int = 256) -> QTensor:
    """MINI quantization — the reference's ``Q_Impurity`` mode rebuilt
    without the GBDT library (GeQuant.cpp:763-830: per-feature learned
    bin boundaries scored by impurity through LiteMORT histograms).

    Impurity of a binning is the within-bin variance; for a fixed bin
    count the minimizer is the Lloyd-Max scalar quantizer, so the
    TPU-native MINI learns a per-ROW 2^bits-entry codebook by Lloyd
    iterations (vectorized over row blocks) — same objective, no tree
    library. Row absmax folds into the codebook entries, so the QTensor
    carries identity group scales and a [rows, 2^bits] codebook.
    """
    assert bits in (3, 4)
    fmt = QFormat.NF4 if bits == 4 else QFormat.NF3
    k = 1 << bits
    w2 = w.reshape(w.shape[0], -1).astype(jnp.float32)
    R, C = w2.shape

    def fit_rows(rows):                                      # [rc, C]
        absmax = jnp.maximum(jnp.max(jnp.abs(rows), axis=1, keepdims=True),
                             1e-12)
        x = rows / absmax
        qs = jnp.quantile(x, jnp.linspace(0.005, 0.995, k), axis=1).T

        def step(cents, _):                                  # [rc, k]
            d = jnp.abs(x[:, :, None] - cents[:, None, :])   # [rc, C, k]
            assign = jnp.argmin(d, axis=2)
            one = jax.nn.one_hot(assign, k, dtype=jnp.float32)
            count = one.sum(1)
            total = (one * x[:, :, None]).sum(1)
            return jnp.where(count > 0, total / jnp.maximum(count, 1),
                             cents), None

        cents, _ = jax.lax.scan(step, qs, None, length=iters)
        cents = jnp.sort(cents, axis=1)
        mids = (cents[:, 1:] + cents[:, :-1]) / 2.0
        codes = jax.vmap(jnp.searchsorted)(mids, x).astype(jnp.uint8)
        return cents * absmax, codes

    # chunk with the largest divisor of R <= row_chunk: the unchunked
    # Lloyd fit builds [R, C, k] distance tensors (hundreds of GB at
    # model widths), so rows like 1600 must still chunk (e.g. at 64)
    rc = next((c for c in (256, 128, 64, 32, 16, 8, 1)
               if c <= row_chunk and R % c == 0), 1)
    if R > rc > 1:
        books, raw = jax.lax.map(fit_rows, w2.reshape(-1, rc, C))
        books = books.reshape(R, k)
        raw = raw.reshape(R, C)
    else:
        books, raw = fit_rows(w2)

    from koifish_tpu.quant.packing import pack_codes
    G = R // group
    codes = pack_codes(raw, fmt, group=group)
    return QTensor(codes=codes, scales=jnp.ones((G, C), jnp.float32),
                   zeros=None, fmt=fmt, shape=(R, C), group=group,
                   codebook=books)
