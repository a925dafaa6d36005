"""On-chip timing of EXACT top-k strategies over a decode-sized logits
matrix ([B, 151936] — Qwen3 vocab). All three candidates return the true
top-k set; only the algorithm differs:

  sort      — jax.lax.top_k (full variadic sort on the scalar unit)
  partial   — jax.lax.approx_max_k(recall_target=1.0): exact per the XLA
              PartialReduce contract, TPU in-register partial reduction
  twostage  — reshape [B, G, V/G], top-k per block, then top-k over the
              G*k survivors. Exact: any global top-k element is top-k
              within its own block.

The winner replaces the exact path in ops/sampling.py (semantics pinned
by tests/test_sampling.py's set-equality check).
"""
import functools
import time

import jax
import jax.numpy as jnp

V = 151936
K = 50


def sort_topk(x, k):
    return jax.lax.top_k(x, k)


def partial_topk(x, k):
    return jax.lax.approx_max_k(x, k, recall_target=1.0)


def twostage_topk(x, k, block=2048):
    b, v = x.shape
    g = -(-v // block)
    pad = g * block - v
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xb = xp.reshape(b, g, block)
    bv, bi = jax.lax.top_k(xb, k)                      # [B, G, K]
    base = (jnp.arange(g) * block)[None, :, None]
    cand_v = bv.reshape(b, g * k)
    cand_i = (bi + base).reshape(b, g * k)
    fv, fi = jax.lax.top_k(cand_v, k)                  # [B, K]
    return fv, jnp.take_along_axis(cand_i, fi, axis=-1)


def time_fn(fn, x, n=50):
    f = jax.jit(functools.partial(fn, k=K))
    v, i = f(x)
    jax.block_until_ready((v, i))
    float(v[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        v, i = f(x)
    float(v[0, 0])
    return (time.perf_counter() - t0) / n * 1e3, (v, i)


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for B in (1, 8, 32, 64):
        x = jax.random.normal(jax.random.PRNGKey(0), (B, V), jnp.bfloat16)
        ref_ms, (rv, ri) = time_fn(sort_topk, x)
        rows = [("sort", ref_ms, True)]
        for name, fn in (("partial", partial_topk),
                         ("twostage", twostage_topk)):
            ms, (v, i) = time_fn(fn, x)
            # exactness: same SET of values (ties can reorder indices)
            ok = bool(jnp.all(jnp.sort(v.astype(jnp.float32), axis=-1)
                              == jnp.sort(rv.astype(jnp.float32), axis=-1)))
            rows.append((name, ms, ok))
        print(f"B={B:3d}  " + "  ".join(
            f"{n}={ms:7.3f}ms exact={ok}" for n, ms, ok in rows))


if __name__ == "__main__":
    main()
