"""Ring attention — sequence parallelism over a mesh axis.

The reference does not scale sequence length across devices at all
(SURVEY.md §5.7). TPU-native implementation: the sequence axis is
sharded over a mesh axis; each step every device computes blockwise
attention of its local Q chunk against the K/V chunk currently in hand,
then rotates K/V around the ring with ``lax.ppermute`` (XLA lowers this
to ICI neighbor transfers that overlap with the next block's compute).
Online-softmax accumulation keeps memory O(T_local).

This is the collective-level formulation; a Pallas RDMA variant
(make_async_remote_copy double-buffered ring) is the next optimization
step on hardware.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -1e30


def _local_block(q, k, v, q_off, k_off, scale):
    """Blockwise causal attention piece: returns (unnormalized out, m, l).
    q [B,Tq,Hq,D] at absolute offset q_off; k/v [B,Tk,Hkv,D] at k_off."""
    b, tq, hq, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, tq, hkv, g, d)
    s = jnp.einsum("bthgd,bshd->bhgts", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    qpos = q_off + jnp.arange(tq)
    kpos = k_off + jnp.arange(tk)
    mask = kpos[None, :] <= qpos[:, None]                    # [tq, tk]
    s = jnp.where(mask[None, None, None], s, _NEG_INF)
    m = jnp.max(s, axis=-1)                                  # [b,h,g,tq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhgts,bshd->bthgd", p, v.astype(jnp.float32))
    return o.reshape(b, tq, hq, d), m.reshape(b, hq, tq), l.reshape(b, hq, tq)


def ring_attention(q, k, v, axis_name: str, scale: Optional[float] = None):
    """Inside shard_map: q/k/v are LOCAL chunks [B, T_loc, H(,kv), D] of a
    sequence sharded over ``axis_name``. Returns local output chunk."""
    b, tl, hq, d = q.shape
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    sp = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    o_acc = jnp.zeros((b, tl, hq, d), jnp.float32)
    m_acc = jnp.full((b, hq, tl), _NEG_INF, jnp.float32)
    l_acc = jnp.zeros((b, hq, tl), jnp.float32)

    def body(step, carry):
        o_acc, m_acc, l_acc, kc, vc = carry
        src = (my - step) % sp                   # whose chunk we hold
        o, m, l = _local_block(q, kc, vc, my * tl, src * tl, scale)
        m_new = jnp.maximum(m_acc, m)
        a_old = jnp.exp(m_acc - m_new)
        a_new = jnp.exp(m - m_new)
        l_acc2 = l_acc * a_old + l * a_new
        o_acc2 = (o_acc * a_old.transpose(0, 2, 1)[..., None]
                  + o * a_new.transpose(0, 2, 1)[..., None])
        perm = [(i, (i + 1) % sp) for i in range(sp)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return o_acc2, m_new, l_acc2, kc, vc

    o_acc, m_acc, l_acc, _, _ = jax.lax.fori_loop(
        0, sp, body, (o_acc, m_acc, l_acc, k, v))
    out = o_acc / jnp.maximum(l_acc.transpose(0, 2, 1)[..., None], 1e-30)
    return out.astype(q.dtype)


def ring_attention_sharded(mesh: Mesh, axis_name: str = "tp"):
    """Returns a function (q, k, v) -> out operating on GLOBAL [B, T, H, D]
    arrays with T sharded over ``axis_name`` via shard_map."""
    spec = P(None, axis_name, None, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec, check_rep=False)
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name)

    return fn
