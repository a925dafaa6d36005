"""Ring-buffer KV cache with StreamingLLM attention sinks + INT8/INT4 KV.

TPU-native rebuild of the reference's decode KV state (``KERNEL_PIPE``:
rolling ``kv_pos`` ring with ``KV_SINKS=2`` pinned tokens,
src/Device/Pipe.hpp:160, 259-266) and its (flag-gated) KV-quant research
modes (src/CLI_params.hpp:488-492, quantizer.cu:844-1050) — here the
quantized KV path is first-class.

Slot policy: positions ``0..sinks-1`` are pinned; later positions map to
``sinks + (pos - sinks) % (size - sinks)`` — identical ring semantics.
Keys are stored RoPE'd at their absolute position (rotation-at-write).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.dtypes import QFormat

QJL_SKETCH_RATIO = 2   # sketch dim m = ratio * head_dim (QJL accuracy knob)
QJL_SEED = 20260713    # fixed projection seed (XI_CARD mask_seed default)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-model cache: leading axis = layer. ``pos`` is the global position
    counter per sequence (monotonic, may exceed ``size``)."""

    k: jax.Array                      # [L,B,H,S,D] bf16 — or int8 codes
    v: jax.Array                      # [L,B,H,S,D]
    k_scale: Optional[jax.Array]      # [L,B,H,S] f32 (quantized KV only)
    v_scale: Optional[jax.Array]
    pos: jax.Array                    # [B] int32
    fmt: QFormat = dataclasses.field(default=QFormat.BF16,
                                     metadata=dict(static=True))
    sinks: int = dataclasses.field(default=2, metadata=dict(static=True))

    @property
    def size(self) -> int:
        return self.k.shape[3]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]


def init_cache(n_layers: int, batch: int, size: int, n_kv_head: int,
               head_dim: int, fmt: QFormat = QFormat.BF16, sinks: int = 2,
               v_head_dim: int = 0) -> KVCache:
    # head-major layout [L, B, H, S, D]: decode kernels block (S, D) tiles
    # per head with no transposes (TPU min-tile rules).
    # v_head_dim: MLA models have K dim != V dim (DeepSeek.cpp:97).
    vd = v_head_dim or head_dim
    kshape = (n_layers, batch, n_kv_head, size, head_dim)
    vshape = (n_layers, batch, n_kv_head, size, vd)
    if fmt is QFormat.BF16:
        k = jnp.zeros(kshape, jnp.bfloat16)
        v = jnp.zeros(vshape, jnp.bfloat16)
        ks = vs = None
    elif fmt is QFormat.INT8:
        k = jnp.zeros(kshape, jnp.int8)
        v = jnp.zeros(vshape, jnp.int8)
        ks = jnp.zeros(kshape[:4], jnp.float32)
        vs = jnp.zeros(vshape[:4], jnp.float32)
    elif fmt is QFormat.INT4:
        # packed 2 codes/byte, block-split along D: byte i holds elements
        # i (low nibble) and i + D/2 (high nibble) — unpack is two
        # contiguous blocks, no lane interleave (same trick as the weight
        # pack order, docs/DESIGN.md)
        assert head_dim % 2 == 0 and vd % 2 == 0
        k = jnp.zeros(kshape[:4] + (head_dim // 2,), jnp.uint8)
        v = jnp.zeros(vshape[:4] + (vd // 2,), jnp.uint8)
        ks = jnp.zeros(kshape[:4], jnp.float32)
        vs = jnp.zeros(vshape[:4], jnp.float32)
    elif fmt is QFormat.QJL:
        # keys = sign-of-JL-projection bits (m = QJL_SKETCH_RATIO * D) +
        # per-key norms in k_scale; values INT8 (ops/qjl.py)
        m = QJL_SKETCH_RATIO * head_dim
        k = jnp.zeros(kshape[:4] + (m // 8,), jnp.uint8)
        v = jnp.zeros(vshape, jnp.int8)
        ks = jnp.zeros(kshape[:4], jnp.float32)    # norms
        vs = jnp.zeros(vshape[:4], jnp.float32)
    else:
        raise ValueError(f"unsupported KV format {fmt}")
    return KVCache(k=k, v=v, k_scale=ks, v_scale=vs,
                   pos=jnp.zeros((batch,), jnp.int32), fmt=fmt, sinks=sinks)


def cache_for(card, batch: int, size: int, fmt: QFormat = QFormat.BF16,
              sinks: int = 2, layered: bool = False):
    """Cache sized from a ModelCard (handles MLA's K/V dim split).
    ``layered=True`` builds the per-layer form directly (LayeredKVCache,
    serve/layered) — no [L, ...] stacked intermediate, which caps the
    allocation transient at one layer instead of 2x the whole cache
    (the B=128 decode OOM driver, parallel/planner.plan_decode)."""
    vd = card.v_head_dim if card.attn == "mla" else 0
    if layered:
        from koifish_tpu.serve.layered import init_layered_cache
        return init_layered_cache(card.n_layer, batch, size,
                                  card.n_kv_head, card.head_dim, fmt=fmt,
                                  sinks=sinks, v_head_dim=vd)
    return init_cache(card.n_layer, batch, size, card.n_kv_head,
                      card.head_dim, fmt=fmt, sinks=sinks, v_head_dim=vd)


def ring_slot(pos: jax.Array, size: int, sinks: int) -> jax.Array:
    """Map absolute position -> cache slot (sinks pinned, rest ring)."""
    wrapped = sinks + (pos - sinks) % (size - sinks)
    return jnp.where(pos < size, pos, wrapped).astype(jnp.int32)


def _quant_kv(x: jax.Array, fmt: QFormat) -> Tuple[jax.Array, jax.Array]:
    """Per-(token, head) absmax quantization of a K/V vector [..., D].
    INT4 returns block-split packed bytes [..., D//2]."""
    qmax = 127.0 if fmt is QFormat.INT8 else 7.0
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -qmax - 1, qmax).astype(jnp.int8)
    if fmt is QFormat.INT4:
        d = q.shape[-1]
        b = (q + 8).astype(jnp.uint8)
        q = b[..., : d // 2] | (b[..., d // 2:] << 4)
    return q, scale


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., D//2] uint8 → [..., D] int8 codes in [-8, 7] (block-split)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


def ring_write(buf: jax.Array, val: jax.Array, slots: jax.Array) -> jax.Array:
    """One-token ring write WITHOUT a scatter: ``buf [B, H, S, ...] <-
    val [B, H, ...]`` at per-lane slot ``slots [B]``.

    ``buf.at[arange(B), :, slots].set(val)`` lowers to an XLA scatter,
    which TPU executes as a serialized per-row loop — measured 33 ms per
    Qwen3-0.6B decode step at B=32 (the whole step should be ~3 ms). An
    ``arange(S) == slot`` select is one fused elementwise pass over the
    buffer it had to rewrite anyway (functional update), fully vector-
    ized, and scales with bytes, not batch.

    Code buffers ([B, H, S, D]) go through the Pallas block-local slot
    writer when eligible (ops/pallas/slotwrite.py): it touches one
    32-row block per lane instead of the whole buffer — 1/32nd the HBM
    traffic of this select at S=1024."""
    from koifish_tpu.ops.pallas.slotwrite import slot_write_or_none
    if buf.ndim == 4:
        out = slot_write_or_none(buf, val, slots)
        if out is not None:
            return out
    S = buf.shape[2]
    mask = jnp.arange(S, dtype=slots.dtype)[None, :] == slots[:, None]  # [B,S]
    mask = mask[:, None, :]                          # [B, 1, S]
    if buf.ndim == 4:
        mask = mask[..., None]                       # [B, 1, S, 1]
        val = val[:, :, None, :]                     # [B, H, 1, D]
    else:                                            # scales [B, H, S]
        val = val[:, :, None]                        # [B, H, 1]
    return jnp.where(mask, val.astype(buf.dtype), buf)


def advance(cache: KVCache, n) -> KVCache:
    """Advance the position counter by ``n`` (once per decode/prefill step —
    writes themselves never move it, so every layer sees the same slots)."""
    return dataclasses.replace(cache, pos=cache.pos + n)


def _rotate_half_step(kf: jax.Array, inv_freq: jax.Array,
                      steps: float = 1.0) -> jax.Array:
    """Rotate roped keys forward by ``steps`` rope positions (rotate-half
    pairing). Pure rotation — preserves any YaRN attn_scale amplitude."""
    half = kf.shape[-1] // 2
    ang = inv_freq * steps
    c, s = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = kf[..., :half], kf[..., half:]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def rotate_sink_keys_layer(k_l: jax.Array, k_scale_l, fmt: QFormat,
                           sinks: int, mask: jax.Array, inv_freq: jax.Array):
    """StreamingLLM sink re-rope (the reference's ``kernel_rotate_sink``,
    operator.cuh:89): once the ring wraps, rotate the pinned sink keys
    forward ONE rope position per generated token so the query→sink
    relative distance stays bounded at ~window instead of growing without
    limit. k_l: [B, H, S, Dc] one layer's key cache; mask: [B] rows in
    the streaming regime (pos >= size). Quantized caches rotate through
    dequant→rotate→requant — same in-place policy as the reference, one
    requantization's noise per step."""
    if sinks <= 0 or fmt is QFormat.QJL or inv_freq is None:
        # QJL keys live as sign-of-projection sketches — a rope rotation
        # is not representable there; streaming past the window keeps
        # absolute angles (documented limitation of the research mode)
        return k_l, k_scale_l
    # The whole rotate sits under a lax.cond on "any row wrapped": before
    # the ring wraps (the common decode regime) the step pays nothing —
    # the unconditional version rewrote the full [B,H,S,D] buffer per
    # layer and cost 4 ms/step on the Qwen3-0.6B B=32 decode (3757 ->
    # 2545 tok/s measured on v5e); XLA forwards the untouched buffer
    # through the false branch.
    any_stream = jnp.any(mask)
    m = mask[:, None, None, None]
    if fmt is QFormat.BF16:
        def _rot(k_l):
            sl = k_l[:, :, :sinks]                      # [B, H, sinks, Dc]
            rot = _rotate_half_step(sl.astype(jnp.float32), inv_freq)
            new = jnp.where(m, rot.astype(k_l.dtype), sl)
            return k_l.at[:, :, :sinks].set(new)
        return jax.lax.cond(any_stream, _rot, lambda k: k, k_l), k_scale_l

    def _rot_q(ops):
        k_l, k_scale_l = ops
        sl = k_l[:, :, :sinks]
        ssc = k_scale_l[:, :, :sinks]                   # [B, H, sinks]
        codes = _unpack_int4(sl) if fmt is QFormat.INT4 else sl
        kf = codes.astype(jnp.float32) * ssc[..., None]
        q, sc = _quant_kv(_rotate_half_step(kf, inv_freq), fmt)
        new_k = jnp.where(m, q, sl)
        new_s = jnp.where(mask[:, None, None], sc, ssc)
        return (k_l.at[:, :, :sinks].set(new_k),
                k_scale_l.at[:, :, :sinks].set(new_s))
    return jax.lax.cond(any_stream, _rot_q, lambda o: o, (k_l, k_scale_l))


def write_token(cache: KVCache, layer: int, k_new: jax.Array, v_new: jax.Array,
                rope_inv_freq=None) -> KVCache:
    """Write one token's K/V ([B, H, D]) for ``layer`` at each sequence's
    current position. Does NOT advance ``pos`` — call :func:`advance`.
    ``rope_inv_freq`` enables the StreamingLLM sink re-rope for rows past
    the window (see :func:`rotate_sink_keys_layer`)."""
    slots = ring_slot(cache.pos, cache.size, cache.sinks)      # [B]
    if rope_inv_freq is not None:
        k_l, ks_l = rotate_sink_keys_layer(
            cache.k[layer], None if cache.k_scale is None
            else cache.k_scale[layer], cache.fmt, cache.sinks,
            cache.pos >= cache.size, rope_inv_freq)
        k_all = cache.k.at[layer].set(k_l)
        ks_all = (cache.k_scale if ks_l is None
                  else cache.k_scale.at[layer].set(ks_l))
        cache = dataclasses.replace(cache, k=k_all, k_scale=ks_all)

    def upd(buf, val):
        # buf[layer] is [B, H, S, ...] — masked ring write (scatter-free)
        return buf.at[layer].set(ring_write(buf[layer], val, slots))

    if cache.fmt is QFormat.BF16:
        k = upd(cache.k, k_new.astype(cache.k.dtype))
        v = upd(cache.v, v_new.astype(cache.v.dtype))
        ks, vs = cache.k_scale, cache.v_scale
    elif cache.fmt is QFormat.QJL:
        from koifish_tpu.ops.qjl import qjl_encode_keys, qjl_projection
        proj = qjl_projection(k_new.shape[-1],
                              QJL_SKETCH_RATIO * k_new.shape[-1], QJL_SEED)
        kq, knorm = qjl_encode_keys(k_new, proj)
        vq, vsc = _quant_kv(v_new, QFormat.INT8)
        k = upd(cache.k, kq)
        v = upd(cache.v, vq)
        ks = upd(cache.k_scale, knorm)
        vs = upd(cache.v_scale, vsc)
    else:
        kq, ksc = _quant_kv(k_new, cache.fmt)
        vq, vsc = _quant_kv(v_new, cache.fmt)
        k = upd(cache.k, kq)
        v = upd(cache.v, vq)
        ks = upd(cache.k_scale, ksc)
        vs = upd(cache.v_scale, vsc)
    return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)


def write_prefill(cache, layer: int, k_new: jax.Array,
                  v_new: jax.Array, start: jax.Array):
    """Write a [B, T, H, D] prefill chunk starting at absolute position
    ``start`` (same for all sequences; T must be <= size - this is the
    batched-prefill improvement over the reference's token-by-token loop,
    GoPT.cpp:1139). Does NOT advance ``pos``.

    Accepts the stacked ``KVCache`` ([L, ...] leaves) OR the per-layer
    ``LayeredKVCache`` (serve/layered) — on the layered form each
    layer's buffer is an independent leaf that XLA updates in place, so
    prefill never needs the stacked representation at all."""
    B, T = k_new.shape[:2]

    def upd(buf, val):
        # val arrives [B, T, H, ...] -> head-major [B, H, T, ...]. The
        # no-wrap precondition makes the slot range start..start+T-1
        # contiguous, so this is one dynamic_update_slice (a [T]-slot
        # fancy-index scatter serializes per row on TPU).
        val = jnp.moveaxis(val, 1, 2).astype(buf[layer].dtype)
        at = (0, 0, start) + (0,) * (val.ndim - 3)
        new_l = jax.lax.dynamic_update_slice(buf[layer], val, at)
        if isinstance(buf, tuple):       # LayeredKVCache leaf tuple
            return buf[:layer] + (new_l,) + buf[layer + 1:]
        return buf.at[layer].set(new_l)

    if cache.fmt is QFormat.BF16:
        k = upd(cache.k, k_new)          # upd casts to the leaf dtype
        v = upd(cache.v, v_new)
        ks, vs = cache.k_scale, cache.v_scale
    elif cache.fmt is QFormat.QJL:
        from koifish_tpu.ops.qjl import qjl_encode_keys, qjl_projection
        proj = qjl_projection(k_new.shape[-1],
                              QJL_SKETCH_RATIO * k_new.shape[-1], QJL_SEED)
        kq, knorm = qjl_encode_keys(k_new, proj)
        vq, vsc = _quant_kv(v_new, QFormat.INT8)
        k = upd(cache.k, kq)
        v = upd(cache.v, vq)
        ks = upd(cache.k_scale, knorm)
        vs = upd(cache.v_scale, vsc)
    else:
        kq, ksc = _quant_kv(k_new, cache.fmt)
        vq, vsc = _quant_kv(v_new, cache.fmt)
        k = upd(cache.k, kq)
        v = upd(cache.v, vq)
        ks = upd(cache.k_scale, ksc)
        vs = upd(cache.v_scale, vsc)
    return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)


def read_layer(cache: KVCache, layer: int, extra: int = 0,
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (k, v, valid_mask) for a layer: k/v [B,S,H,D] bf16, mask [B,S].
    ``extra`` counts tokens written this step but not yet reflected in
    ``pos`` (writes don't advance it).

    Quantized caches are dequantized here; the fused Pallas decode-attention
    kernel (ops/pallas/decode_attn.py) reads codes directly instead.
    """
    if cache.fmt is QFormat.QJL:
        raise ValueError("QJL keys are sign sketches — not reconstructible; "
                         "use ops.qjl.qjl_decode_attention")
    valid = jnp.arange(cache.size)[None, :] < jnp.minimum(
        cache.pos + extra, cache.size)[:, None]
    k, v = cache.k[layer], cache.v[layer]          # [B, H, S, D]
    if cache.fmt is QFormat.INT4:
        k, v = _unpack_int4(k), _unpack_int4(v)
    if cache.fmt is not QFormat.BF16:
        k = (k.astype(jnp.float32) * cache.k_scale[layer][..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * cache.v_scale[layer][..., None]).astype(jnp.bfloat16)
    return jnp.moveaxis(k, 1, 2), jnp.moveaxis(v, 1, 2), valid
