"""Pallas RDMA ring attention vs the ppermute ring and full attention.

Runs on the 8-virtual-device CPU mesh via the Pallas TPU interpreter,
which emulates make_async_remote_copy across devices.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from koifish_tpu.parallel.ring_attention import ring_attention_sharded
from koifish_tpu.parallel.ring_pallas import (fits_vmem,
                                              ring_attention_pallas_sharded)


def _mesh(n):
    devs = jax.devices()[:n]
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs), ("sp",))


@pytest.mark.parametrize("n_dev", [4])
def test_ring_pallas_matches_ppermute_and_full(n_dev):
    mesh = _mesh(n_dev)
    B, T, Hq, Hkv, D = 2, n_dev * 16, 4, 2, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, T, Hq, D), jnp.float32) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hkv, D),
                          jnp.float32) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hkv, D),
                          jnp.float32) * 0.5

    out_p = ring_attention_pallas_sharded(mesh, "sp", interpret=True)(q, k, v)
    out_r = ring_attention_sharded(mesh, "sp")(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=2e-2, atol=2e-2)

    # full (unsharded) causal attention oracle
    g = Hq // Hkv
    kf = jnp.repeat(k, g, axis=2).astype(jnp.float32)
    vf = jnp.repeat(v, g, axis=2).astype(jnp.float32)
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), kf) / (D ** 0.5)
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhts,bshd->bthd", p, vf)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fits_vmem_guard():
    assert fits_vmem(2, 64, 4, 2, 128)
    assert not fits_vmem(8, 8192, 16, 8, 128)
