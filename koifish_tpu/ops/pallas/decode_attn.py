"""Fused quantized-KV decode attention — Pallas TPU kernel.

SURVEY.md §7 hard-part #2: read INT8 K/V codes directly inside the
attention kernel (per-(position, head) scales) without materializing a
bf16 cache — halving decode HBM traffic vs dequant-then-attend. The
analog of the reference's decode attention kernels + (flag-gated)
KV-quant modes (operator.cuh:573-709, quantizer.cu:844-1050), fused.

Scale handling without extra tensors in VMEM-hostile shapes:
- K scales multiply attention logits along the S (lane) axis;
- V scales fold into the probability vector before the PV matmul —
  so codes never need per-element scale broadcasts over D.

Program-count economics: decode work per (batch, head) is tiny, so the
kernel processes ``HB`` heads per grid program with an unrolled in-kernel
loop — grid overhead, not FLOPs, dominates single-token attention.

Layout contract (serve/kvcache.py): cache is head-major [B, H, S, D]
(reshaped to [BH, S, D] views, no copies); scales [BH, S] are passed
padded to [BH, 8, S] so their tiles meet the (8, 128) min-tile rule.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
BS = 512          # S tile
GPAD = 8          # q head-group rows padded to sublane count
HB = 8            # (batch, head) pairs per grid program

_INTERPRET = False


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _platform_is_tpu() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def decode_attention_int8_or_none(
    q: jax.Array,          # [B, Hq, D]
    k_codes: jax.Array,    # [B, Hkv, S, D] int8
    v_codes: jax.Array,    # [B, Hkv, S, D] int8
    k_scale: jax.Array,    # [B, Hkv, S] f32
    v_scale: jax.Array,    # [B, Hkv, S] f32
    lengths: jax.Array,    # [B] int32 — valid slots per sequence
    scale: float,
) -> Optional[jax.Array]:
    b, hq, d = q.shape
    hkv, s = k_codes.shape[1], k_codes.shape[2]
    g = hq // hkv
    bh = b * hkv
    eligible = (
        _platform_is_tpu()
        and s % BS == 0
        and d in (64, 128, 256)
        and v_codes.shape[-1] == d      # MLA (K dim != V dim) not fused yet
        and g <= GPAD
        and k_codes.dtype == jnp.int8
    )
    if not eligible:
        return None
    hb = next(h for h in (HB, 4, 2, 1) if bh % h == 0)

    qg = q.reshape(b, hkv, g, d)
    qp = jnp.zeros((b, hkv, GPAD, d), jnp.bfloat16).at[:, :, :g].set(
        qg.astype(jnp.bfloat16)).reshape(bh, GPAD, d)
    kc = k_codes.reshape(bh, s, d)
    vc = v_codes.reshape(bh, s, d)
    ks = jnp.broadcast_to(k_scale.reshape(bh, 1, s), (bh, 8, s)).astype(jnp.float32)
    vs = jnp.broadcast_to(v_scale.reshape(bh, 1, s), (bh, 8, s)).astype(jnp.float32)
    lens = jnp.repeat(lengths, hkv).astype(jnp.int32)           # [BH]

    out = _decode_kernel_call(qp, kc, vc, ks, vs, lens, scale=scale,
                              s=s, d=d, hb=hb)
    return out.reshape(b, hkv, GPAD, d)[:, :, :g].reshape(b, hq, d)


@functools.partial(jax.jit, static_argnames=("scale", "s", "d", "hb"))
def _decode_kernel_call(qp, kc, vc, ks, vs, lens, *, scale, s, d, hb):
    HB = hb
    bh = qp.shape[0]
    grid = (bh // HB, s // BS)
    kernel = functools.partial(_decode_kernel, scale=scale, HB=HB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((HB, GPAD, d), lambda h, j, lens: (h, 0, 0)),
            pl.BlockSpec((HB, BS, d), lambda h, j, lens: (h, j, 0)),
            pl.BlockSpec((HB, BS, d), lambda h, j, lens: (h, j, 0)),
            pl.BlockSpec((HB, 8, BS), lambda h, j, lens: (h, 0, j)),
            pl.BlockSpec((HB, 8, BS), lambda h, j, lens: (h, 0, j)),
        ],
        out_specs=pl.BlockSpec((HB, GPAD, d), lambda h, j, lens: (h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HB, GPAD, d), jnp.float32),
            pltpu.VMEM((HB * GPAD, 1), jnp.float32),
            pltpu.VMEM((HB * GPAD, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, GPAD, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(lens, qp, kc, vc, ks, vs)


def _decode_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                   o_acc, m_acc, l_acc, *, scale, HB):
    hg = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[:] = jnp.zeros_like(l_acc)

    for h in range(HB):                     # unrolled heads per program
        n_valid = lens_ref[hg * HB + h]

        @pl.when(j * BS < n_valid)
        def _(h=h, n_valid=n_valid):
            qb = q_ref[h]                                  # [GPAD, d] bf16
            kb = k_ref[h].astype(jnp.bfloat16)             # int8 -> bf16
            s_int = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)
            ksr = ks_ref[h][0:1, :]                        # [1, BS]
            logits = s_int * ksr * scale                   # K dequant on logits
            spos = j * BS + jax.lax.broadcasted_iota(jnp.int32, (GPAD, BS), 1)
            logits = jnp.where(spos < n_valid, logits, _NEG_INF)

            m_prev = m_acc[h * GPAD:(h + 1) * GPAD]
            m_new = jnp.maximum(m_prev,
                                jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_acc[h * GPAD:(h + 1) * GPAD] = \
                l_acc[h * GPAD:(h + 1) * GPAD] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            pv = (p * vs_ref[h][0:1, :]).astype(jnp.bfloat16)
            o_acc[h] = o_acc[h] * alpha + jnp.dot(
                pv, v_ref[h].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            m_acc[h * GPAD:(h + 1) * GPAD] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        for h in range(HB):
            l = jnp.maximum(l_acc[h * GPAD:(h + 1) * GPAD], 1e-30)
            o_ref[h] = (o_acc[h] / l).astype(o_ref.dtype)
