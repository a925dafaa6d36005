"""Op-level correctness: fused chunked CE vs dense CE (values + grads)."""
import jax
import jax.numpy as jnp
import numpy as np

from koifish_tpu.ops.cross_entropy import cross_entropy_loss, fused_ce_loss


def test_fused_ce_matches_dense():
    key = jax.random.PRNGKey(0)
    B, T, E, V = 2, 8, 32, 1000   # V not divisible by chunk -> tests padding
    hidden = jax.random.normal(key, (B, T, E))
    head = jax.random.normal(jax.random.PRNGKey(1), (E, V)) * 0.1
    targets = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)
    mask = (jnp.arange(T)[None, :] < 6).astype(jnp.float32) * jnp.ones((B, 1))

    logits = jnp.einsum("bte,ev->btv", hidden,
                        head.astype(jnp.bfloat16).astype(jnp.float32))
    dense, dense_tok = cross_entropy_loss(logits, targets, mask)
    fused, fused_tok = fused_ce_loss(hidden, head, targets, mask, chunk=256)
    np.testing.assert_allclose(float(dense), float(fused), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(dense_tok), np.asarray(fused_tok),
                               rtol=3e-2, atol=3e-2)


def test_fused_ce_grads_match():
    key = jax.random.PRNGKey(0)
    B, T, E, V = 1, 4, 16, 512
    hidden = jax.random.normal(key, (B, T, E))
    head = jax.random.normal(jax.random.PRNGKey(1), (E, V)) * 0.1
    targets = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, V)

    def dense_loss(h, w):
        logits = jnp.einsum("bte,ev->btv", h,
                            w.astype(jnp.bfloat16).astype(jnp.float32))
        return cross_entropy_loss(logits, targets)[0]

    def fused_loss(h, w):
        return fused_ce_loss(h, w, targets, chunk=128)[0]

    gd = jax.grad(dense_loss, argnums=(0, 1))(hidden, head)
    gf = jax.grad(fused_loss, argnums=(0, 1))(hidden, head)
    for a, b, n in zip(gd, gf, ["dh", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3), n


def test_int8_matmul_fwd_close_bwd_exact_shape():
    from koifish_tpu.ops.int8_train import int8_matmul
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.bfloat16) * 0.05
    ref = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
    out = int8_matmul(x, w).astype(jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # dgrad/wgrad are bf16 (dgrad against dequantized fwd codes) — close
    g = jax.grad(lambda x, w: (int8_matmul(x, w).astype(jnp.float32) ** 2
                               ).sum(), argnums=(0, 1))(x, w)
    gr = jax.grad(lambda x, w: (jnp.dot(x, w).astype(jnp.float32) ** 2
                                ).sum(), argnums=(0, 1))(x, w)
    for a, b in zip(g, gr):
        rel = float(jnp.linalg.norm(a.astype(jnp.float32) - b.astype(jnp.float32))
                    / (jnp.linalg.norm(b.astype(jnp.float32)) + 1e-9))
        assert rel < 0.1, rel


def test_int8_matmul_wgrad_mode():
    """Experimental full-int8 wgrad (per-column scales on both operands of
    the x^T @ dy dot) stays within quantization-noise distance of bf16."""
    from koifish_tpu.ops.int8_train import int8_matmul
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.bfloat16) * 0.05
    g = jax.grad(lambda x, w: (int8_matmul(x, w, True).astype(jnp.float32) ** 2
                               ).sum(), argnums=1)(x, w)
    gr = jax.grad(lambda x, w: (jnp.dot(x, w).astype(jnp.float32) ** 2
                                ).sum(), argnums=1)(x, w)
    rel = float(jnp.linalg.norm(g.astype(jnp.float32) - gr.astype(jnp.float32))
                / (jnp.linalg.norm(gr.astype(jnp.float32)) + 1e-9))
    assert rel < 0.1, rel


def test_int8_matmul_dgrad_mode():
    """int8 dgrad via scale folding (dx = (dy . s_w) @ codes^T) stays
    within quantization-noise distance of the bf16 dgrad AND of the true
    gradient."""
    from koifish_tpu.ops.int8_train import int8_matmul
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 512), jnp.bfloat16) * 0.05
    gx = jax.grad(lambda x: (int8_matmul(x, w, False, True
                                         ).astype(jnp.float32) ** 2).sum())(x)
    gr = jax.grad(lambda x: (jnp.dot(x, w).astype(jnp.float32) ** 2).sum())(x)
    rel = float(jnp.linalg.norm(gx.astype(jnp.float32) - gr.astype(jnp.float32))
                / (jnp.linalg.norm(gr.astype(jnp.float32)) + 1e-9))
    assert rel < 0.1, rel


def test_int8_train_step_converges():
    """int8-forward training learns the +1 pattern like bf16 does."""
    import numpy as np
    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=256,
                               n_head=4, n_kv_head=2, head_dim=64, n_ffn=256,
                               n_ctx=32, max_pos=64)
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100,
                      int8_matmul=True, int8_min_kn=0)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses


def test_int8_dgrad_train_step_converges():
    """int8 fwd + int8 dgrad (scale-folded dy) training still learns."""
    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step
    card = ModelCard.from_arch("QWEN3", vocab_size=128, n_layer=2, n_embd=256,
                               n_head=4, n_kv_head=2, head_dim=64, n_ffn=256,
                               n_ctx=32, max_pos=64)
    tcard = TrainCard(batch=8, lr=0.01, warmup=3, dump_every=100,
                      int8_matmul=True, int8_dgrad=True, int8_min_kn=0)
    state = init_train_state(card, tcard)
    step = make_train_step(card, tcard, total_steps=20)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(15):
        key, k = jax.random.split(key)
        s = jax.random.randint(k, (8, 1), 0, 64)
        batch = {"tokens": ((s + jnp.arange(33)[None]) % 64)[None
                 ].astype(jnp.int32)}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses


def test_int8_fused_ce_loss_parity():
    """int8 chunk dots in the fused classifier (the FP8 head-GEMM analog)
    must track the bf16 loss curve closely — the head is the one weight
    big enough for dynamic int8 to pay (ops/int8_train sizing note)."""
    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    card = ModelCard.from_arch(
        "QWEN3", vocab_size=66560, n_layer=1, n_embd=64, n_head=4,
        n_kv_head=2, head_dim=16, n_ffn=128, n_ctx=16, max_pos=32)

    def run(int8):
        tcard = TrainCard(batch=4, lr=0.01, warmup=3, seed=42,
                          int8_matmul=int8, int8_min_kn=0)
        state = init_train_state(card, tcard)
        step = make_train_step(card, tcard, total_steps=10)
        key = jax.random.PRNGKey(0)
        losses = []
        for _ in range(6):
            key, k = jax.random.split(key)
            s = jax.random.randint(k, (4, 1), 0, 64)
            batch = {"tokens": ((s + jnp.arange(17)[None]) % 64)[None
                     ].astype(jnp.int32)}
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        return losses

    bf, q8 = run(False), run(True)
    assert max(abs(a - b) / a for a, b in zip(bf, q8)) < 0.02


def test_topk_sampling_exact_by_default_and_approx_divergence():
    """The sampler default is EXACT lax.top_k (matches the reference's
    exact top-k heap, GoPT.hpp:86-88); approx_max_k is opt-in and its
    distribution divergence from exact is pinned here (it trades ~0.95
    recall for ~10x speed on large vocabs)."""
    import inspect
    import numpy as np
    from koifish_tpu.ops.sampling import filtered_probs, sample_logits

    assert inspect.signature(sample_logits).parameters["approx"].default \
        is False
    assert inspect.signature(filtered_probs).parameters["approx"].default \
        is False

    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 8192),
                               jnp.float32) * 3.0
    exact = np.asarray(filtered_probs(logits, 0.8, 50, 0.95))
    # exact path == dense numpy oracle
    lf = np.asarray(logits, np.float64) / 0.8
    for b in range(4):
        order = np.argsort(lf[b])[::-1]
        kept = lf[b][order[:50]]
        p = np.exp(kept - kept.max()); p /= p.sum()
        cum = np.cumsum(p)
        keep = (cum - p) < 0.95
        pk = np.where(keep, p, 0.0); pk /= pk.sum()
        dense = np.zeros(8192); dense[order[:50]] = pk
        np.testing.assert_allclose(exact[b], dense, atol=2e-5)

    approx = np.asarray(filtered_probs(logits, 0.8, 50, 0.95, approx=True))
    tvd = 0.5 * np.abs(exact - approx).sum(-1)
    # approx recall ~0.95 -> small but NONZERO divergence; pin the band so
    # a silent default flip in either direction fails this test
    assert tvd.max() < 0.25, tvd


def test_kernel_log_dedup(capsys):
    """Fallback observability (utils/kernel_log): once per (kernel,
    reason); positive choices only in verbose mode; CPU suppressed at
    default level but forced on at level 2."""
    import os
    from koifish_tpu.utils import kernel_log
    kernel_log.reset()
    kernel_log.set_verbose(False)
    old = os.environ.get("KOIFISH_DUMP_KERNELS")
    try:
        os.environ["KOIFISH_DUMP_KERNELS"] = "2"
        kernel_log.fallback("k1", "reason-a")
        kernel_log.fallback("k1", "reason-a")   # deduped
        kernel_log.fallback("k1", "reason-b")
        kernel_log.choice("k2", "picked")
        err = capsys.readouterr().err
        assert err.count("reason-a") == 1
        assert err.count("reason-b") == 1
        assert "k2" in err
        # default level: CPU backend logs nothing (tests would drown)
        kernel_log.reset()
        os.environ["KOIFISH_DUMP_KERNELS"] = "1"
        kernel_log.fallback("k3", "quiet-on-cpu")
        assert "k3" not in capsys.readouterr().err
    finally:
        if old is None:
            os.environ.pop("KOIFISH_DUMP_KERNELS", None)
        else:
            os.environ["KOIFISH_DUMP_KERNELS"] = old
        kernel_log.reset()
