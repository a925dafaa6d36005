"""Fused quantized-KV decode attention — Pallas TPU kernel.

SURVEY.md §7 hard-part #2: read INT8/INT4 K/V codes directly inside the
attention kernel (per-(position, head) scales) without materializing a
bf16 cache — halving (INT8) or quartering (INT4) decode HBM traffic vs
dequant-then-attend. The analog of the reference's decode attention
kernels + (flag-gated) KV-quant modes (operator.cuh:573-709,
quantizer.cu:844-1050), fused.

Scale handling without extra tensors in VMEM-hostile shapes:
- K scales multiply attention logits along the S (lane) axis;
- V scales fold into the probability vector before the PV matmul —
  so codes never need per-element scale broadcasts over D.

INT4 codes arrive packed 2/byte block-split along D (byte i = elements
i and i+D/2, serve/kvcache.py) — in-kernel unpack is two contiguous
nibble extractions + a concat, no lane interleave.

The value head dim ``dv`` may differ from the key dim ``d`` (MLA:
DeepSeek K=nope+rope, V=v_head_dim — reference DeepSeek.cpp:97).

Program-count economics: decode work per (batch, head) is tiny, so the
kernel processes ``HB`` heads per grid program with an unrolled in-kernel
loop — grid overhead, not FLOPs, dominates single-token attention.

Layout contract (serve/kvcache.py): cache is head-major [B, H, S, D]
(reshaped to [BH, S, D] views, no copies); scales ride as flat [BH, S]
rows blocked (8, BS) when HB==8, else broadcast-padded to [BH, 8, S] to
meet the (8, 128) min-tile rule on small shapes.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# Tile/program sizing measured on v5e (B=32, Hkv=8, S=1024, D=128 INT8,
# jitted-scan micro): the kernel is PROGRAM-overhead-bound, not
# HBM-bound — HB=16/BS=1024 (16 programs) runs 649 us vs 1151 us for
# HB=8/BS=512 (64 programs) at len=150, and 720 vs 733 at len=1000.
BS = 1024         # preferred S tile (falls back to 512 when S % 1024 != 0)
GPAD = 8          # q head-group rows padded to sublane count
HB = 16           # (batch, head) pairs per grid program

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


def decode_attention_quant_or_none(
    q: jax.Array,          # [B, Hq, D]
    k_codes: jax.Array,    # [B, Hkv, S, D] int8 | [B, Hkv, S, D//2] uint8
    v_codes: jax.Array,    # [B, Hkv, S, Dv] int8 | [B, Hkv, S, Dv//2] uint8
    k_scale: jax.Array,    # [B, Hkv, S] f32
    v_scale: jax.Array,    # [B, Hkv, S] f32
    lengths: jax.Array,    # [B] int32 — valid slots per sequence
    scale: float,
) -> Optional[jax.Array]:
    b, hq, d = q.shape
    hkv, s = k_codes.shape[1], k_codes.shape[2]
    g = hq // hkv
    bh = b * hkv
    int4 = k_codes.dtype == jnp.uint8
    dv = v_codes.shape[-1] * (2 if int4 else 1)
    bs = next((b for b in (BS, 512, 256) if s % b == 0), 0)
    eligible = (
        _platform_is_tpu()
        and bs > 0
        and d in (64, 128, 192, 256)
        and dv in (64, 128, 192, 256)
        and g <= GPAD
        and (k_codes.dtype == jnp.int8 or int4)
        and v_codes.dtype == k_codes.dtype
    )
    if not eligible:
        from koifish_tpu.utils import kernel_log
        kernel_log.fallback(
            "decode_attention_int8",
            f"b={b} hq={hq} hkv={hkv} d={d} dv={dv} s={s} "
            f"dtype={k_codes.dtype}: need d/dv in (64,128,192,256), "
            f"g<= {GPAD}, S tile-able, int8/int4 codes -> XLA dequant")
        return None
    hb = next(h for h in (HB, 8, 4, 2, 1) if bh % h == 0)

    qg = q.reshape(b, hkv, g, d)
    qp = jnp.zeros((b, hkv, GPAD, d), jnp.bfloat16).at[:, :, :g].set(
        qg.astype(jnp.bfloat16)).reshape(bh, GPAD, d)
    kc = k_codes.reshape(bh, s, k_codes.shape[-1])
    vc = v_codes.reshape(bh, s, v_codes.shape[-1])
    if hb == 8:
        # scales as flat [BH, S] blocked (8, BS): one row per (batch,
        # head) pair — the [BH, 8, S] sublane-padded layout materialized
        # an 8x broadcast copy (450 MB/step across a 28-layer decode)
        ks = k_scale.reshape(bh, s).astype(jnp.float32)
        vs = v_scale.reshape(bh, s).astype(jnp.float32)
    else:  # small-shape fallback keeps the (8,128) min tile
        ks = jnp.broadcast_to(k_scale.reshape(bh, 1, s),
                              (bh, 8, s)).astype(jnp.float32)
        vs = jnp.broadcast_to(v_scale.reshape(bh, 1, s),
                              (bh, 8, s)).astype(jnp.float32)
    lens = jnp.repeat(lengths, hkv).astype(jnp.int32)           # [BH]

    out = _decode_kernel_call(qp, kc, vc, ks, vs, lens, scale=scale,
                              s=s, d=d, dv=dv, hb=hb, int4=int4, bs=bs)
    return out.reshape(b, hkv, GPAD, dv)[:, :, :g].reshape(b, hq, dv)


# back-compat alias (round-1 name; INT8-only then)
decode_attention_int8_or_none = decode_attention_quant_or_none


@functools.partial(jax.jit,
                   static_argnames=("scale", "s", "d", "dv", "hb", "int4",
                                    "bs"))
def _decode_kernel_call(qp, kc, vc, ks, vs, lens, *, scale, s, d, dv, hb,
                        int4, bs=None):
    HB = hb
    BS = bs or globals()["BS"]
    bh = qp.shape[0]
    grid = (bh // HB, s // BS)
    flat_scales = ks.ndim == 2
    kernel = functools.partial(_decode_kernel, scale=scale, HB=HB, int4=int4,
                               flat_scales=flat_scales, BS=BS)
    dk_c = kc.shape[-1]     # packed (d//2) or full d
    dv_c = vc.shape[-1]

    def _sj(h, j, lens):
        # S-tile index, clamped to 0 past this block-row's longest valid
        # sequence: revisiting block 0 costs no HBM fetch (same index =>
        # the pipeline reuses the resident block) and the in-kernel
        # pl.when skips the compute — short contexts stop paying for
        # full-ring cache reads (S=1024 at pos~100 was 8x wasted fetch).
        m = lens[h * HB]
        for i in range(1, HB):
            m = jnp.maximum(m, lens[h * HB + i])
        return jnp.where(j * BS < m, j, 0)

    if flat_scales:
        s_spec = pl.BlockSpec((HB, BS), lambda h, j, lens: (h, _sj(h, j, lens)))
    else:
        s_spec = pl.BlockSpec((HB, 8, BS),
                              lambda h, j, lens: (h, 0, _sj(h, j, lens)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((HB, GPAD, d), lambda h, j, lens: (h, 0, 0)),
            pl.BlockSpec((HB, BS, dk_c),
                         lambda h, j, lens: (h, _sj(h, j, lens), 0)),
            pl.BlockSpec((HB, BS, dv_c),
                         lambda h, j, lens: (h, _sj(h, j, lens), 0)),
            s_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((HB, GPAD, dv), lambda h, j, lens: (h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HB, GPAD, dv), jnp.float32),
            pltpu.VMEM((HB * GPAD, 1), jnp.float32),
            pltpu.VMEM((HB * GPAD, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, GPAD, dv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(lens, qp, kc, vc, ks, vs)


def _unpack4(b):
    """[S, D//2] uint8 → [S, D] bf16 codes (block-split nibbles).
    Widen to i32 before shift/sub — Mosaic has no sub-word vector ALU ops
    (the int8 form compiled in the interpreter but failed on chip)."""
    c = b.astype(jnp.int32)
    lo = (c & 0xF) - 8
    hi = ((c >> 4) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)


def _decode_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                   o_acc, m_acc, l_acc, *, scale, HB, int4,
                   flat_scales=False, BS=BS):
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
            kb = _unpack4(k_ref[h]) if int4 \
                else k_ref[h].astype(jnp.bfloat16)
            s_int = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)
            ksr = ks_ref[h:h + 1, :] if flat_scales \
                else ks_ref[h][0:1, :]                     # [1, BS]
            logits = s_int * ksr * scale                   # K dequant on logits
            spos = j * BS + jax.lax.broadcasted_iota(jnp.int32,
                                                     logits.shape, 1)
            logits = jnp.where(spos < n_valid, logits, _NEG_INF)

            m_prev = m_acc[h * GPAD:(h + 1) * GPAD]
            m_new = jnp.maximum(m_prev,
                                jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_acc[h * GPAD:(h + 1) * GPAD] = \
                l_acc[h * GPAD:(h + 1) * GPAD] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            vsr = vs_ref[h:h + 1, :] if flat_scales \
                else vs_ref[h][0:1, :]
            pv = (p * vsr).astype(jnp.bfloat16)
            vb = _unpack4(v_ref[h]) if int4 \
                else v_ref[h].astype(jnp.bfloat16)
            o_acc[h] = o_acc[h] * alpha + jnp.dot(
                pv, vb, preferred_element_type=jnp.float32)
            m_acc[h * GPAD:(h + 1) * GPAD] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        for h in range(HB):
            l = jnp.maximum(l_acc[h * GPAD:(h + 1) * GPAD], 1e-30)
            o_ref[h] = (o_acc[h] / l).astype(o_ref.dtype)
