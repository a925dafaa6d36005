"""Pallas RDMA ring attention — ICI-overlapped sequence parallelism.

The collective-level ring (parallel/ring_attention.py) rotates K/V with
``lax.ppermute``: XLA schedules the transfer between steps, so overlap
with compute is at the compiler's mercy. This variant runs the WHOLE
ring inside one Pallas kernel per device: K/V live in a double-buffered
VMEM comm buffer; each step STARTS the remote DMA of the current chunk
to the right neighbor (``pltpu.make_async_remote_copy`` — raw ICI RDMA),
computes blockwise causal attention on the chunk in hand, then waits —
the transfer rides the ICI while the MXU works.

Layout/size contract: the whole local chunk must fit VMEM
(q + o + acc ≈ 14·B·Tl·Hq·D bytes + 4 comm buffers of B·Tl·Hkv·D·2) —
``fits_vmem`` guards; callers fall back to the ppermute ring above it.

Validated against the ppermute ring on a multi-device CPU mesh via the
Pallas TPU interpreter (which emulates remote DMAs); single-chip runs
never take this path (sp == 1).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -1e30
_VMEM_BUDGET = 100 * 1024 * 1024


def fits_vmem(b: int, tl: int, hq: int, hkv: int, d: int) -> bool:
    acc = b * tl * hq * d * (4 + 4 + 2)        # acc_o f32 + o/q bf16-ish
    comm = 4 * b * tl * hkv * d * 2            # 2 slots x (k, v) bf16
    return acc + comm + 2 * b * hq * tl * 4 < _VMEM_BUDGET


def _ring_kernel(q_ref, k_ref, v_ref, o_ref, commk, commv, acc_o, acc_m,
                 acc_l, send_k, recv_k, send_v, recv_v, ack, *,
                 n_dev: int, axis_name: str, scale: float, g: int,
                 barrier: bool):
    b, tl, hq, d = q_ref.shape
    hkv = k_ref.shape[2]
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n_dev)
    left = jax.lax.rem(my + n_dev - 1, n_dev)

    if barrier:
        # neighbors must have allocated their comm buffers before any
        # RDMA touches them (hardware path; the interpreter has no
        # barrier semaphores and needs none — its DMAs rendezvous)
        bsem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(bsem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(bsem, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(bsem, 2)

    commk[0] = k_ref[...].astype(commk.dtype)
    commv[0] = v_ref[...].astype(commv.dtype)
    acc_o[...] = jnp.zeros_like(acc_o)
    acc_m[...] = jnp.full_like(acc_m, _NEG_INF)
    acc_l[...] = jnp.zeros_like(acc_l)

    qpos = my * tl + jax.lax.broadcasted_iota(
        jnp.int32, (tl * g, 1), 0) // g                     # [tl*g, 1]

    for s in range(n_dev):
        cur, nxt = s % 2, (s + 1) % 2
        if s + 1 < n_dev:
            if barrier and s >= 1:
                # per-slot ack: the right neighbor must be done computing
                # on the slot this send overwrites (a device can run one
                # step ahead of its left neighbor — without the ack its
                # send would race our read of the same slot). Interpreter
                # DMAs rendezvous synchronously, so the hardware-only
                # handshake is skipped there.
                pltpu.semaphore_wait(ack.at[nxt], 1)
            rdma_k = pltpu.make_async_remote_copy(
                src_ref=commk.at[cur], dst_ref=commk.at[nxt],
                send_sem=send_k.at[cur], recv_sem=recv_k.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma_v = pltpu.make_async_remote_copy(
                src_ref=commv.at[cur], dst_ref=commv.at[nxt],
                send_sem=send_v.at[cur], recv_sem=recv_v.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma_k.start()
            rdma_v.start()

        src = jax.lax.rem(my + n_dev - s, n_dev)        # whose chunk we hold
        kpos = src * tl + jax.lax.broadcasted_iota(
            jnp.int32, (1, tl), 1)                          # [1, tl]
        for bi in range(b):
            for h in range(hkv):
                # [tl, g, d] -> [tl*g, d] query rows for this kv head
                qb = q_ref[bi, :, h * g:(h + 1) * g, :].reshape(
                    tl * g, d).astype(jnp.bfloat16)
                kb = commk[cur, bi, :, h, :].astype(jnp.bfloat16)
                logits = jnp.dot(qb, kb.T,
                                 preferred_element_type=jnp.float32) * scale
                logits = jnp.where(kpos <= qpos, logits, _NEG_INF)
                m_prev = acc_m[bi, h]                       # [tl*g, 1]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(logits, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(logits - m_new)
                acc_l[bi, h] = acc_l[bi, h] * alpha + \
                    jnp.sum(p, axis=-1, keepdims=True)
                vb = commv[cur, bi, :, h, :].astype(jnp.bfloat16)
                acc_o[bi, h] = acc_o[bi, h] * alpha + jnp.dot(
                    p.astype(jnp.bfloat16), vb,
                    preferred_element_type=jnp.float32)
                acc_m[bi, h] = m_new

        if barrier and s + 1 < n_dev:
            # tell the LEFT neighbor our just-used slot is reusable (its
            # step-(s+1) send targets it)
            pltpu.semaphore_signal(ack.at[cur], inc=1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        if s + 1 < n_dev:
            rdma_k.wait()
            rdma_v.wait()

    for bi in range(b):
        for h in range(hkv):
            o = acc_o[bi, h] / jnp.maximum(acc_l[bi, h], 1e-30)
            o_ref[bi, :, h * g:(h + 1) * g, :] = o.reshape(
                tl, g, d).astype(o_ref.dtype)


def ring_attention_pallas(q, k, v, axis_name: str,
                          scale: Optional[float] = None,
                          n_dev: Optional[int] = None,
                          interpret: Optional[bool] = None):
    """Inside shard_map: q [B,Tl,Hq,D], k/v [B,Tl,Hkv,D] local chunks of a
    sequence sharded over ``axis_name``. Returns the local output chunk."""
    b, tl, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    n = n_dev if n_dev is not None else jax.device_count()
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    kernel = functools.partial(_ring_kernel, n_dev=n, axis_name=axis_name,
                               scale=scale, g=g, barrier=not interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, tl, hq, d), q.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b, tl, hkv, d), jnp.bfloat16),   # commk
            pltpu.VMEM((2, b, tl, hkv, d), jnp.bfloat16),   # commv
            pltpu.VMEM((b, hkv, tl * g, d), jnp.float32),   # acc_o
            pltpu.VMEM((b, hkv, tl * g, 1), jnp.float32),   # acc_m
            pltpu.VMEM((b, hkv, tl * g, 1), jnp.float32),   # acc_l
            pltpu.SemaphoreType.DMA((2,)),                  # send_k
            pltpu.SemaphoreType.DMA((2,)),                  # recv_k
            pltpu.SemaphoreType.DMA((2,)),                  # send_v
            pltpu.SemaphoreType.DMA((2,)),                  # recv_v
            pltpu.SemaphoreType.REGULAR((2,)),              # ack (per slot)
        ],
        compiler_params=pltpu.CompilerParams(collective_id=7),
        interpret=interpret,
    )(q, k, v)


def ring_attention_pallas_sharded(mesh: Mesh, axis_name: str = "tp",
                                  interpret: Optional[bool] = None):
    """(q, k, v) on GLOBAL [B, T, H, D] arrays, T sharded over
    ``axis_name`` — Pallas-RDMA ring when the chunk fits VMEM, else the
    ppermute ring."""
    from jax.experimental.shard_map import shard_map
    spec = P(None, axis_name, None, None)
    n = mesh.shape[axis_name]

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec, check_rep=False)
    def fn(q, k, v):
        b, tl, hq, d = q.shape
        if n > 1 and fits_vmem(b, tl, hq, k.shape[2], d):
            return ring_attention_pallas(q, k, v, axis_name, n_dev=n,
                                         interpret=interpret)
        from koifish_tpu.parallel.ring_attention import ring_attention
        return ring_attention(q, k, v, axis_name)

    return fn
