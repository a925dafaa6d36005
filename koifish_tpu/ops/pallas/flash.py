"""Flash attention (training fwd) — Pallas TPU kernel.

Replaces the reference's cuDNN flash-attention graphs (src/Device/CUDA/
QKV.cu:130-313). Online-softmax blocked attention over K/V tiles with GQA,
causal masking, optional sliding window. Falls back to None (caller uses
the XLA path) when shapes don't qualify."""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _platform_is_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _eligible(q, k, window: int) -> bool:
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    return (
        _platform_is_tpu()
        and tq == tk                      # self-attention training/prefill
        and tq % 256 == 0
        and d in (64, 128, 256)
        and hq % hkv == 0
        and window == 0
    )


def flash_attention_or_none(q, k, v, *, scale: float, window: int = 0
                            ) -> Optional[jax.Array]:
    """Differentiable causal attention: Pallas forward when eligible, with
    a recompute-based backward through the XLA reference path (the fused
    backward kernel is the analog of the reference's cuDNN bwd graph,
    QKV.cu:216-313 — recompute-bwd costs one extra forward but keeps
    memory O(T), matching flash semantics)."""
    if not _eligible(q, k, window):
        return None
    return _flash_diff(q, k, v, scale)


def _ref_causal(q, k, v, scale):
    from koifish_tpu.ops import attention as attn
    return attn.causal_attention(q, k, v, scale=scale, backend="ref")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return _flash(q, k, v, scale=scale)


def _flash_diff_fwd(q, k, v, scale):
    return _flash(q, k, v, scale=scale), (q, k, v)


def _flash_diff_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _ref_causal(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash(q, k, v, *, scale: float):
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    bq, bk = 256, 256
    grid = (b * hq, t // bq, t // bk)   # kv tile innermost (sequential)

    # layout: fold batch*head into leading grid dim; kernel sees [bq, d] tiles
    qh = q.transpose(0, 2, 1, 3).reshape(b * hq, t, d)
    kh = jnp.repeat(k.transpose(0, 2, 1, 3), g, axis=1).reshape(b * hq, t, d)
    vh = jnp.repeat(v.transpose(0, 2, 1, 3), g, axis=1).reshape(b * hq, t, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, bq=bq, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hq, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),   # o accumulator
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running sum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * t * d // 2,
            bytes_accessed=3 * b * hq * t * d * 2 + b * hq * t * d * 2,
            transcendentals=b * hq * t * t // 2,
        ),
    )(qh, kh, vh)
    return out.reshape(b, hq, t, d).transpose(0, 2, 1, 3)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, o_acc, m_acc, l_acc,
                  *, scale, bq, bk):
    i = pl.program_id(1)   # q tile
    j = pl.program_id(2)   # kv tile

    @pl.when(j == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[:] = jnp.zeros_like(l_acc)

    # skip fully-masked tiles (above causal diagonal)
    @pl.when(j <= i)
    def _():
        qb = q_ref[0].astype(jnp.float32) * scale
        kb = k_ref[0].astype(jnp.float32)
        s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32)  # [bq, bk]

        # causal mask via global positions (only bites on the diagonal tile)
        qpos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(kpos <= qpos, s, _NEG_INF)

        m_prev = m_acc[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_acc[:] = l_acc[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_acc[:] = o_acc[:] * alpha + jnp.dot(
            p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        m_acc[:] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (o_acc[:] / jnp.maximum(l_acc[:], 1e-30)).astype(o_ref.dtype)
