"""Layer-stacked decode — lax.scan over layers for minimal op count.

The unrolled decode step emits ~20 HLO ops × n_layers; on runtimes with
per-op dispatch cost that overhead dominates single-token latency (it
measured as the floor of the Qwen3-0.6B decode step). Stacking the layer
params ([L, ...] leaves) and scanning one compiled layer body brings the
op count down to O(one layer) — the decode analog of what the reference
gets from its single monolithic ``T_generate_cuda`` kernel
(src/Manifold/Generate.cu:180-346).

Requires homogeneous layers (same pytree structure/dtypes per layer —
true for uniform-quant dense models). Heterogeneous per-layer formats
fall back to the unrolled `serve.engine.decode_step`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.dtypes import QFormat
from koifish_tpu.models.transformer import (
    Params, _norm, embed_tokens, gather_embed, lm_head, mlp, qkv_project)
from koifish_tpu.ops.attention import decode_attention
from koifish_tpu.serve import kvcache as kvc
from koifish_tpu.serve.engine import _rope_tables
from koifish_tpu.serve.kvcache import KVCache


def stack_layers(params: Params) -> Optional[Params]:
    """Stack per-layer pytrees into [L, ...] leaves; None if heterogeneous."""
    layers = params["layers"]
    ref = jax.tree_util.tree_structure(layers[0])
    for lp in layers[1:]:
        if jax.tree_util.tree_structure(lp) != ref:
            return None
    try:
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *layers)
    except (ValueError, TypeError):
        return None
    out = dict(params)
    out["layers"] = stacked
    return out


def decode_step_stacked(card: ModelCard, sparams: Params, token: jax.Array,
                        cache: KVCache, streaming: bool = True,
                        ) -> Tuple[jax.Array, KVCache]:
    """One decode step with a lax.scan over the stacked layer axis.
    ``streaming`` (static): see layered.decode_step_layered — False
    compiles out the sink re-rope for pre-wrap dispatches."""
    B = token.shape[0]
    if card.attn == "mla":
        positions = jnp.minimum(cache.pos, card.max_pos - 1)[:, None]
        cos, sin = _rope_tables(card)
        inv_freq, rope_pos = None, positions
    else:
        # unclamped positions + direct rope + per-step sink re-rope: see
        # engine.decode_step (streaming past the window)
        from koifish_tpu.serve.engine import _decode_rope
        positions = cache.pos[:, None]
        cos, sin, inv_freq = _decode_rope(card, positions)
        rope_pos = None
    x = embed_tokens(card, sparams, token[:, None])
    if card.pos_embed == "learned":
        wpe_pos = jnp.minimum(positions[:, 0], card.max_pos - 1)
        x = x + jnp.take(sparams["wpe"], wpe_pos, axis=0)[:, None]

    slots = kvc.ring_slot(cache.pos, cache.size, cache.sinks)   # [B]
    valid = jnp.arange(cache.size)[None, :] < jnp.minimum(
        cache.pos + 1, cache.size)[:, None]
    quant_kv = cache.fmt is not QFormat.BF16
    stream_rows = cache.pos >= cache.size                       # [B]

    def body(x, layer_in):
        if quant_kv:
            lp, kl, vl, ksl, vsl = layer_in
        else:
            lp, kl, vl = layer_in
            ksl = vsl = None
        if streaming and inv_freq is not None:
            kl, ksl = kvc.rotate_sink_keys_layer(
                kl, ksl, cache.fmt, cache.sinks, stream_rows, inv_freq)
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        q, k, v = qkv_project(card, lp, h, cos, sin, rope_pos)
        k1, v1 = k[:, 0], v[:, 0]                   # [B, H, D]
        a = None
        if quant_kv:
            kq, ksc = kvc._quant_kv(k1, cache.fmt)
            vq, vsc = kvc._quant_kv(v1, cache.fmt)
            kl = kvc.ring_write(kl, kq, slots)
            vl = kvc.ring_write(vl, vq, slots)
            ksl = kvc.ring_write(ksl, ksc, slots)
            vsl = kvc.ring_write(vsl, vsc, slots)
            if cache.fmt in (QFormat.INT8, QFormat.INT4):
                # fused kernel reads codes directly — no bf16 cache copy
                from koifish_tpu.ops.pallas.decode_attn import (
                    decode_attention_int8_or_none)
                lengths = jnp.minimum(cache.pos + 1, cache.size)
                a = decode_attention_int8_or_none(
                    q[:, 0], kl, vl, ksl, vsl, lengths,
                    1.0 / (q.shape[-1] ** 0.5))
            if a is None:
                kd, vd_ = kl, vl
                if cache.fmt is QFormat.INT4:
                    kd, vd_ = kvc._unpack_int4(kl), kvc._unpack_int4(vl)
                kf = (kd.astype(jnp.float32) * ksl[..., None]
                      ).astype(jnp.bfloat16)
                vf = (vd_.astype(jnp.float32) * vsl[..., None]
                      ).astype(jnp.bfloat16)
        else:
            kl = kvc.ring_write(kl, k1, slots)
            vl = kvc.ring_write(vl, v1, slots)
            kf, vf = kl, vl
        if a is None:
            a = decode_attention(q[:, 0], jnp.moveaxis(kf, 1, 2),
                                 jnp.moveaxis(vf, 1, 2), valid)
        from koifish_tpu.models.transformer import _linear_l
        a = _linear_l(a.reshape(B, 1, -1), lp, "o")
        x = x + a
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        x = x + mlp(card, lp, h)
        if quant_kv:
            return x, (kl, vl, ksl, vsl)
        return x, (kl, vl)

    if quant_kv:
        xs = (sparams["layers"], cache.k, cache.v, cache.k_scale,
              cache.v_scale)
    else:
        xs = (sparams["layers"], cache.k, cache.v)
    x, ys = jax.lax.scan(body, x, xs)
    if quant_kv:
        k_new, v_new, ks_new, vs_new = ys
    else:
        k_new, v_new = ys
        ks_new = vs_new = None

    x = _norm(card, x, sparams["ln_f"], sparams.get("ln_f_b"))
    logits = lm_head(card, sparams, x)[:, 0]
    import dataclasses
    cache = dataclasses.replace(cache, k=k_new, v=v_new, k_scale=ks_new,
                                v_scale=vs_new)
    return logits, kvc.advance(cache, 1)
