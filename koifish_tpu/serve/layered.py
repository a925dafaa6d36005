"""Per-layer decode cache — the zero-copy decode path.

Round-2 profiling (xplane trace of the Qwen3-0.6B INT4+INT8KV decode
step, B=32) showed the layer-stacked scan spends ~80% of its 24 ms step
on cache *plumbing*, not compute: the [L,B,H,S,D] cache flowing through
``lax.scan`` as xs/ys costs two full-cache copies per token (XLA
double-buffers the carry), a full-layer rewrite for the one-token ring
write, and 4x async slice pipelines — while the fused attention kernel
itself takes 3.5 ms. The reference never hits this because its CUDA
decode writes the KV slot in place (Pipe.hpp:160 rolling kv_pos).

The TPU-native fix is structural: keep the decode cache as a pytree of
PER-LAYER arrays. Each layer's buffers are independent while-loop
carries, dead after their functional update, so XLA updates them in
place; the one-token write is a [B,H,1,D] ``dynamic_update_slice``
(uniform-position batches: one scalar slot) or a masked lane-select
(continuous batching: per-lane slots). Per-step HBM traffic drops to
the attention kernel's code reads — the speed-of-light floor.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.dtypes import QFormat
from koifish_tpu.models.transformer import (
    Params, _linear_l, _norm, gather_embed, lm_head, mlp, qkv_project)
from koifish_tpu.ops.attention import decode_attention
from koifish_tpu.serve import kvcache as kvc
from koifish_tpu.serve.kvcache import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayeredKVCache:
    """KVCache split into per-layer leaves (decode-only representation)."""
    k: Tuple[jax.Array, ...]                     # L x [B, H, S, D(|/2)]
    v: Tuple[jax.Array, ...]
    k_scale: Optional[Tuple[jax.Array, ...]]     # L x [B, H, S]
    v_scale: Optional[Tuple[jax.Array, ...]]
    pos: jax.Array                               # [B]
    fmt: QFormat = dataclasses.field(default=QFormat.BF16,
                                     metadata=dict(static=True))
    sinks: int = dataclasses.field(default=2, metadata=dict(static=True))
    # True when every lane shares the same position (plain generate):
    # enables the scalar-slot dynamic_update_slice write path
    uniform: bool = dataclasses.field(default=True,
                                      metadata=dict(static=True))

    @property
    def size(self) -> int:
        return self.k[0].shape[2]

    @property
    def n_layers(self) -> int:
        return len(self.k)


import functools


@functools.lru_cache(maxsize=None)
def _jit_layered_init(n_layers: int, batch: int, size: int,
                      n_kv_head: int, head_dim: int, fmt: QFormat,
                      sinks: int, v_head_dim: int, uniform: bool):
    """One jitted no-arg executable per cache config: all the per-layer
    zeros land in a single dispatch. The eager loop version issued
    ~4 x L separate allocation ops — on a tunneled runtime their device
    execution serialized ahead of the first prefill and showed up as
    ~0.5 s of fake TTFT (bench round-5 measurement)."""

    def build() -> LayeredKVCache:
        ks, vs, kss, vss = [], [], [], []
        for _ in range(n_layers):
            c1 = kvc.init_cache(1, batch, size, n_kv_head, head_dim, fmt,
                                sinks, v_head_dim)
            ks.append(c1.k[0])
            vs.append(c1.v[0])
            if c1.k_scale is not None:
                kss.append(c1.k_scale[0])
                vss.append(c1.v_scale[0])
        return LayeredKVCache(
            k=tuple(ks), v=tuple(vs),
            k_scale=tuple(kss) if kss else None,
            v_scale=tuple(vss) if vss else None,
            pos=jnp.zeros((batch,), jnp.int32), fmt=fmt, sinks=sinks,
            uniform=uniform)

    return jax.jit(build)


def init_layered_cache(n_layers: int, batch: int, size: int,
                       n_kv_head: int, head_dim: int,
                       fmt: QFormat = QFormat.BF16, sinks: int = 2,
                       v_head_dim: int = 0, uniform: bool = True,
                       ) -> LayeredKVCache:
    """Build the per-layer cache DIRECTLY — no [L, ...] stacked
    intermediate ever exists. This is the B-scaling fix the round-4
    sweep wall pointed at (parallel/planner.plan_decode): going through
    ``init_cache`` + ``split_cache`` holds BOTH the stacked and the
    per-layer copies alive for one step (2x KV — the measured B=128
    OOM at Qwen3-0.6B/S=1024 on 16 GB); building layered caps the
    transient at one layer. ``kvcache.write_prefill`` / ``read_layer``
    / ``advance`` all accept this type, so prefill fills it in place
    and ``generate`` never splits."""
    return _jit_layered_init(n_layers, batch, size, n_kv_head, head_dim,
                             fmt, sinks, v_head_dim, uniform)()


def split_cache(cache: KVCache, uniform: bool = True) -> LayeredKVCache:
    """[L, ...] cache -> per-layer tuples (one copy, at the prefill/decode
    boundary only — never inside the token loop)."""
    L = cache.n_layers
    tup = lambda a: tuple(a[l] for l in range(L)) if a is not None else None
    return LayeredKVCache(k=tup(cache.k), v=tup(cache.v),
                          k_scale=tup(cache.k_scale),
                          v_scale=tup(cache.v_scale),
                          pos=cache.pos, fmt=cache.fmt, sinks=cache.sinks,
                          uniform=uniform)


def join_cache(lc: LayeredKVCache) -> KVCache:
    stk = lambda t: jnp.stack(t) if t is not None else None
    return KVCache(k=stk(lc.k), v=stk(lc.v), k_scale=stk(lc.k_scale),
                   v_scale=stk(lc.v_scale), pos=lc.pos, fmt=lc.fmt,
                   sinks=lc.sinks)


def _write(buf: jax.Array, val: jax.Array, slots: jax.Array,
           uniform: bool) -> jax.Array:
    """One-token write into [B, H, S, ...] at per-lane ``slots`` [B]."""
    if uniform:
        # all lanes share the slot: a [B, H, 1, ...] dynamic_update_slice
        # XLA performs in place on a dead carry buffer
        val = val[:, :, None].astype(buf.dtype)
        start = (0, 0, slots[0]) + (0,) * (buf.ndim - 3)
        return jax.lax.dynamic_update_slice(buf, val, start)
    return kvc.ring_write(buf, val, slots)


def decode_step_layered(card: ModelCard, params: Params, token: jax.Array,
                        lc: LayeredKVCache, streaming: bool = True,
                        ) -> Tuple[jax.Array, LayeredKVCache]:
    """One decode step over per-layer cache leaves: token [B] -> logits
    [B, V]. Params may be the plain per-layer-list pytree (no stacking
    needed — the layer loop is unrolled).

    ``streaming`` (static): False compiles out the per-step sink re-rope
    — sound whenever no row's pos can reach the window within this
    executable's steps (the host dispatcher checks pos + k <= size).
    The rotate is a per-layer cache rewrite; even under lax.cond the
    false branch pays buffer round-trips (~23% of the Qwen3-0.6B B=32
    step), so pre-wrap decode uses a separate executable, like the
    prefill ``fresh`` flag."""
    from koifish_tpu.serve.engine import _decode_rope, _rope_tables
    if card.arch == "GUPPY":
        from koifish_tpu.models.guppy import inject_rows
        params = inject_rows(card, params, None)
    B = token.shape[0]
    if card.attn == "mla":
        positions = jnp.minimum(lc.pos, card.max_pos - 1)[:, None]
        cos, sin = _rope_tables(card)
        inv_freq, rope_pos = None, positions
    else:
        # unclamped positions + direct rope + per-step sink re-rope: see
        # engine.decode_step (streaming past the window)
        positions = lc.pos[:, None]
        cos, sin, inv_freq = _decode_rope(card, positions)
        rope_pos = None
    stream_rows = lc.pos >= lc.size                         # [B]
    x = gather_embed(params["wte"], token[:, None])
    if card.pos_embed == "learned":
        wpe_pos = jnp.minimum(positions[:, 0], card.max_pos - 1)
        x = x + jnp.take(params["wpe"], wpe_pos, axis=0)[:, None]

    slots = kvc.ring_slot(lc.pos, lc.size, lc.sinks)        # [B]
    lengths = jnp.minimum(lc.pos + 1, lc.size)
    valid = jnp.arange(lc.size)[None, :] < lengths[:, None]
    quant = lc.fmt is not QFormat.BF16
    att_scale = 1.0 / (card.head_dim ** 0.5)
    from koifish_tpu.ops.pallas.decode_attn import (
        decode_attention_quant_or_none)

    k_out, v_out, ks_out, vs_out = [], [], [], []
    layers = params["layers"]
    if not isinstance(layers, list):    # stacked [L, ...] leaves: unstack
        layers = [jax.tree_util.tree_map(lambda a: a[li], layers)
                  for li in range(card.n_layer)]
    for li, lp in enumerate(layers):
        kl, vl = lc.k[li], lc.v[li]
        ksl_in = lc.k_scale[li] if quant else None
        if streaming and inv_freq is not None and lc.fmt is not QFormat.QJL:
            kl, ksl_rot = kvc.rotate_sink_keys_layer(
                kl, ksl_in, lc.fmt, lc.sinks, stream_rows, inv_freq)
        else:
            ksl_rot = ksl_in
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        q, k, v = qkv_project(card, lp, h, cos, sin, rope_pos)
        k1, v1 = k[:, 0], v[:, 0]                           # [B, H, D]
        a = None
        if lc.fmt is QFormat.QJL:
            from koifish_tpu.ops.qjl import (qjl_decode_attention,
                                             qjl_encode_keys, qjl_projection)
            proj = qjl_projection(card.head_dim,
                                  kvc.QJL_SKETCH_RATIO * card.head_dim,
                                  kvc.QJL_SEED)
            kq, knorm = qjl_encode_keys(k1, proj)
            vq, vsc = kvc._quant_kv(v1, QFormat.INT8)
            kl = _write(kl, kq, slots, lc.uniform)
            vl = _write(vl, vq, slots, lc.uniform)
            ksl = _write(ksl_rot, knorm, slots, lc.uniform)
            vsl = _write(lc.v_scale[li], vsc, slots, lc.uniform)
            ks_out.append(ksl); vs_out.append(vsl)
            vlf = (vl.astype(jnp.float32) * vsl[..., None]
                   ).astype(jnp.bfloat16)
            a = qjl_decode_attention(q[:, 0], kl, ksl, vlf, valid, proj,
                                     att_scale)
        elif quant:
            kq, ksc = kvc._quant_kv(k1, lc.fmt)
            vq, vsc = kvc._quant_kv(v1, lc.fmt)
            kl = _write(kl, kq, slots, lc.uniform)
            vl = _write(vl, vq, slots, lc.uniform)
            ksl = _write(ksl_rot, ksc, slots, lc.uniform)
            vsl = _write(lc.v_scale[li], vsc, slots, lc.uniform)
            ks_out.append(ksl); vs_out.append(vsl)
            if lc.fmt in (QFormat.INT8, QFormat.INT4):
                a = decode_attention_quant_or_none(
                    q[:, 0], kl, vl, ksl, vsl, lengths, att_scale)
            if a is None:
                kd, vd_ = kl, vl
                if lc.fmt is QFormat.INT4:
                    kd, vd_ = kvc._unpack_int4(kl), kvc._unpack_int4(vl)
                kf = (kd.astype(jnp.float32) * ksl[..., None]
                      ).astype(jnp.bfloat16)
                vf = (vd_.astype(jnp.float32) * vsl[..., None]
                      ).astype(jnp.bfloat16)
        else:
            kl = _write(kl, k1, slots, lc.uniform)
            vl = _write(vl, v1, slots, lc.uniform)
            kf, vf = kl, vl
        k_out.append(kl); v_out.append(vl)
        if a is None:
            a = decode_attention(q[:, 0], jnp.moveaxis(kf, 1, 2),
                                 jnp.moveaxis(vf, 1, 2), valid)
        a = _linear_l(a.reshape(B, 1, -1), lp, "o")
        x = x + a
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h)

    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    # bf16 logits: halves the [B, V] write + the sampler's read; the
    # sampler upcasts to f32 after its top-k cut
    logits = lm_head(card, params, x, out_dtype=jnp.bfloat16)[:, 0]
    lc = dataclasses.replace(
        lc, k=tuple(k_out), v=tuple(v_out),
        k_scale=tuple(ks_out) if ks_out else lc.k_scale,
        v_scale=tuple(vs_out) if vs_out else lc.v_scale,
        pos=lc.pos + 1)
    return logits, lc
