"""On-chip kernel smoke harness — run every Pallas entry point once.

Interpret-mode tests validate kernel LOGIC but not Mosaic lowering: the
INT4-KV decode kernel passed the interpreter for a full round while its
int8 vector sub failed the real chip (fixed 07712a4). This harness
compiles + executes each kernel with production-shaped smalls on
whatever TPU backend is attached and checks outputs against the XLA
oracles. Run after touching any kernel:

    python -u tools/kernel_smoke.py [--quick]

--quick: one GEMV row-count per format (m=8) instead of three; ~20
compiles instead of ~48 (each is a ~20-40 s remote compile on tunneled
runtimes — budget 30+ min for the full run, and NEVER let an external
timeout kill it mid-RPC: run it under its own generous `timeout`).
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))


def main() -> int:
    failures = []

    def check(name, err, tol=0.03):
        ok = err < tol
        print(f"{'ok ' if ok else 'FAIL'} {name}: err={err:.4f}", flush=True)
        if not ok:
            failures.append(name)

    def guarded(name, fn, tol=0.03):
        try:
            check(name, fn(), tol)
        except Exception as e:                   # compile failures count
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            failures.append(name)

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")

    # --- quantized GEMM / GEMV, every format -----------------------------
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.quant.rtn import quantize
    import koifish_tpu.ops.pallas.matmul as pmm
    w = jax.random.normal(jax.random.PRNGKey(1), (1024, 512),
                          jnp.float32) * 0.02
    quick = "--quick" in sys.argv
    ms = (8,) if quick else (8, 32, 256)
    for fmt in (QFormat.INT8, QFormat.INT4, QFormat.NF4, QFormat.INT3,
                QFormat.NF3, QFormat.INT2, QFormat.TERNARY, QFormat.BINARY):
        qt = quantize(w, fmt, group=128)
        for m in ms:
            def _run(m=m, qt=qt):
                x = jax.random.normal(jax.random.PRNGKey(m), (m, 1024),
                                      jnp.bfloat16)
                ref = pmm._ref_qmatmul(x, qt, jnp.float32)
                out = pmm.qmatmul_pallas_or_ref(x, qt, jnp.float32)
                return _rel(out, ref)
            guarded(f"qmatmul {fmt.name} m={m}", _run)

    # --- learned-codebook (LUT) kernels: kmeans/MINI/sinkhorn ------------
    from koifish_tpu.quant.cluster import (quantize_kmeans, quantize_mini,
                                           quantize_sinkhorn)
    for label, qt in (("kmeans", quantize_kmeans(w, bits=4, group=128)),
                      ("mini", quantize_mini(w, bits=4, group=128)),
                      ("sinkhorn", quantize_sinkhorn(w, QFormat.INT4,
                                                     group=128))):
        for m in ms:
            def _run_b(m=m, qt=qt):
                x = jax.random.normal(jax.random.PRNGKey(m), (m, 1024),
                                      jnp.bfloat16)
                ref = pmm._ref_qmatmul(x, qt, jnp.float32)
                out = pmm.qmatmul_pallas_or_ref(x, qt, jnp.float32)
                return _rel(out, ref)
            guarded(f"qmatmul_{label} m={m}", _run_b)

    # --- experimental int8-MXU GEMV: parity + timed vs the bf16-dot GEMV --
    qt8 = quantize(w, QFormat.INT8, group=128)
    for m in ms:
        if m > 32:
            continue

        def _run_i8(m=m):
            x = jax.random.normal(jax.random.PRNGKey(m), (m, 1024),
                                  jnp.bfloat16)
            ref = pmm._ref_qmatmul(x, qt8, jnp.float32)
            out = pmm.qmv_int8_mxu(x, qt8.codes, qt8.scales, group=128,
                                   k=1024).astype(jnp.float32)
            return _rel(out, ref)
        guarded(f"qmv_int8_mxu m={m}", _run_i8)
    if not quick:
        # timing must go through ONE jitted callable with a loop-carried
        # dependency — eager per-call dispatch re-traces on the tunneled
        # runtime and measures milliseconds of host overhead, not the
        # kernel (first version printed 18 ms / 616 ms here)
        import time as _t
        x0 = jax.random.normal(jax.random.PRNGKey(7), (32, 1024),
                               jnp.bfloat16)

        def _timed(name, one):
            @jax.jit
            def reps(x):
                def body(x, _):
                    y = one(x)
                    return (x + y[:, :1] * 1e-6).astype(x.dtype), ()
                x, _ = jax.lax.scan(body, x, None, length=50)
                return x
            try:
                float(reps(x0)[0, 0])              # compile + warm
                t0 = _t.perf_counter()
                float(reps(x0)[0, 0])
                print(f"  [timing] {name}: "
                      f"{(_t.perf_counter() - t0) / 50 * 1e6:.1f} us/call")
            except Exception as e:  # timing is advisory, never fails smoke
                print(f"  [timing] {name}: failed {e!r}")

        _timed("bf16-dot GEMV", lambda x: pmm.qmatmul_pallas_or_ref(
            x, qt8, jnp.float32)[:, :512])
        _timed("int8-MXU GEMV", lambda x: pmm.qmv_int8_mxu(
            x, qt8.codes, qt8.scales, group=128, k=1024
            ).astype(jnp.float32)[:, :512])

    # --- flash attention fwd/bwd (incl. sliding window) -------------------
    from koifish_tpu.ops.attention import causal_attention
    import koifish_tpu.ops.pallas.flash as pfl
    B, T, Hq, Hkv, D = 2, 1024, 4, 2, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, Hq, D),
                          jnp.bfloat16) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, Hkv, D),
                          jnp.bfloat16) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, Hkv, D),
                          jnp.bfloat16) * 0.5
    sc = 1.0 / D ** 0.5
    for window in (0, 256):
        def _fwd(window=window):
            out = pfl.flash_attention_or_none(q, k, v, scale=sc,
                                              window=window)
            assert out is not None, "kernel ineligible"
            return _rel(out, causal_attention(q, k, v, scale=sc,
                                              window=window, backend="ref"))
        guarded(f"flash fwd window={window}", _fwd)

        def _bwd(window=window):
            gf = jax.grad(lambda q: (pfl.flash_attention_or_none(
                q, k, v, scale=sc, window=window).astype(jnp.float32) ** 2
            ).sum())(q)
            gr = jax.grad(lambda q: (causal_attention(
                q, k, v, scale=sc, window=window, backend="ref"
            ).astype(jnp.float32) ** 2).sum())(q)
            return _rel(gf, gr)
        guarded(f"flash bwd dq window={window}", _bwd, tol=0.06)

    # --- fused quantized-KV decode attention ------------------------------
    from koifish_tpu.ops.pallas.decode_attn import (
        decode_attention_quant_or_none)
    from koifish_tpu.serve import kvcache as kvc
    B, H, S, Dd = 8, 8, 1024, 128
    qd = jax.random.normal(jax.random.PRNGKey(3), (B, 2 * H, Dd),
                           jnp.bfloat16)
    kraw = jax.random.normal(jax.random.PRNGKey(4), (B, H, S, Dd),
                             jnp.float32)
    vraw = jax.random.normal(jax.random.PRNGKey(5), (B, H, S, Dd),
                             jnp.float32)
    lengths = jnp.full((B,), 700, jnp.int32)
    valid = jnp.arange(S)[None, :] < lengths[:, None]

    def oracle(kf, vf):
        from koifish_tpu.ops.attention import decode_attention
        return decode_attention(qd, jnp.moveaxis(kf, 1, 2),
                                jnp.moveaxis(vf, 1, 2), valid)

    for fmt in (QFormat.INT8, QFormat.INT4):
        def _dec(fmt=fmt):
            kq, ks = kvc._quant_kv(kraw, fmt)
            vq, vs = kvc._quant_kv(vraw, fmt)
            kd = kvc._unpack_int4(kq) if fmt is QFormat.INT4 else kq
            vd = kvc._unpack_int4(vq) if fmt is QFormat.INT4 else vq
            kf = (kd.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
            vf = (vd.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
            out = decode_attention_quant_or_none(qd, kq, vq, ks, vs, lengths,
                                                 1.0 / Dd ** 0.5)
            assert out is not None, "kernel ineligible"
            return _rel(out, oracle(kf, vf))
        guarded(f"decode_attn {fmt.name}", _dec, tol=0.05)

    # --- MLA-shaped fused decode (K dim != V dim) --------------------------
    def _mla():
        vraw2 = jax.random.normal(jax.random.PRNGKey(6), (B, H, S, 64),
                                  jnp.float32)
        kq, ks = kvc._quant_kv(kraw, QFormat.INT8)
        vq, vs = kvc._quant_kv(vraw2, QFormat.INT8)
        out = decode_attention_quant_or_none(qd, kq, vq, ks, vs, lengths,
                                             1.0 / Dd ** 0.5)
        assert out is not None, "kernel ineligible"
        vf = (vq.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
        kf = (kq.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        return _rel(out, oracle(kf, vf))
    guarded("decode_attn MLA dv=64", _mla, tol=0.05)

    # --- QJL decode attention ---------------------------------------------
    # Oracle = the SAME QJL estimator recomputed in plain f32-highest jnp
    # from the unpacked signs. Comparing to exact-key attention (the first
    # version of this check) measures the JL sketch's statistical noise —
    # err ~1.0 even on CPU with random q/k at m=2D — not chip correctness.
    from koifish_tpu.ops.qjl import (_SQRT_PI_OVER_2, qjl_decode_attention,
                                     qjl_encode_keys, qjl_projection,
                                     qjl_unpack_signs)
    def _qjl():
        proj = qjl_projection(Dd, 2 * Dd)
        kq_b, knorm = qjl_encode_keys(kraw.astype(jnp.bfloat16), proj)
        vf = vraw.astype(jnp.bfloat16)
        out = qjl_decode_attention(qd, kq_b, knorm, vf, valid, proj,
                                   1.0 / Dd ** 0.5)
        m = proj.shape[1]
        g = qd.shape[1] // H                   # GQA: g query heads per kv
        qp = jnp.einsum("bhd,dm->bhm", qd.astype(jnp.float32), proj,
                        precision="highest").reshape(B, H, g, m)
        signs = qjl_unpack_signs(kq_b)                      # [B,H,S,m]
        est = jnp.einsum("bhgm,bhsm->bhgs", qp, signs,
                         precision="highest")
        est = est * (_SQRT_PI_OVER_2 / m) * knorm[:, :, None, :] / Dd ** 0.5
        est = jnp.where(valid[:, None, None, :], est, -1e30)
        p = jax.nn.softmax(est, axis=-1)
        want = jnp.einsum("bhgs,bhsd->bhgd", p, vf.astype(jnp.float32),
                          precision="highest").reshape(B, H * g, Dd)
        return _rel(out, want)
    guarded("qjl decode attention", _qjl, tol=0.05)

    # --- per-lane KV slot write (scatter-free block-local) ----------------
    from koifish_tpu.ops.pallas import slotwrite as psw

    def _slotw(dtype, dc):
        B, H, S = 8, 8, 1024
        if dtype == jnp.bfloat16:
            buf = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, dc),
                                    dtype)
            val = jax.random.normal(jax.random.PRNGKey(1), (B, H, dc), dtype)
        else:
            buf = jax.random.randint(jax.random.PRNGKey(0), (B, H, S, dc),
                                     0, 120).astype(dtype)
            val = jax.random.randint(jax.random.PRNGKey(1), (B, H, dc),
                                     0, 120).astype(dtype)
        sl = jnp.asarray([0, 31, 32, 700, 701, 1023, 512, 5], jnp.int32)
        got = psw.slot_write_or_none(buf, val, sl)
        assert got is not None, "kernel ineligible"
        mask = (jnp.arange(S)[None, :] == sl[:, None])[:, None, :, None]
        want = jnp.where(mask, val[:, :, None, :], buf)
        return float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                     - want.astype(jnp.float32))))
    guarded("slot_write int8", lambda: _slotw(jnp.int8, 128), tol=1e-6)
    guarded("slot_write uint4x2", lambda: _slotw(jnp.uint8, 64), tol=1e-6)
    guarded("slot_write bf16", lambda: _slotw(jnp.bfloat16, 128), tol=1e-6)

    # --- paged KV: page writer + TPU paged_attention read path -------------
    def _pagew():
        from koifish_tpu.serve.paged import PAGE, _page_write_ref
        H, NP, D, Bp = 8, 16, 128, 8
        pages = jax.random.normal(jax.random.PRNGKey(0), (H, NP, PAGE, D),
                                  jnp.bfloat16)
        pv = jax.random.normal(jax.random.PRNGKey(1), (Bp, H, D),
                               jnp.bfloat16)
        pids = jnp.asarray([0, 2, 4, 6, 8, 10, 12, 15], jnp.int32)
        rows = jnp.asarray([0, 1, 7, 63, 64, 100, 126, 127], jnp.int32)
        from koifish_tpu.ops.pallas.slotwrite import page_write_or_none
        got = page_write_or_none(pages, pv, pids, rows)
        assert got is not None, "kernel ineligible"
        return _rel(got, _page_write_ref(pages, pv, pids, rows))
    guarded("page_write", _pagew, tol=1e-6)

    def _paged_read():
        from koifish_tpu.serve.paged import (PAGE, _paged_attention,
                                             _paged_attention_ref)
        Hkv, NP, D, Bp, maxp = 8, 32, 128, 4, 8
        kp = jax.random.normal(jax.random.PRNGKey(0), (Hkv, NP, PAGE, D),
                               jnp.bfloat16) * 0.5
        vp = jax.random.normal(jax.random.PRNGKey(1), (Hkv, NP, PAGE, D),
                               jnp.bfloat16) * 0.5
        qq = jax.random.normal(jax.random.PRNGKey(2), (Bp, 2 * Hkv, D),
                               jnp.bfloat16)
        tbl = jnp.arange(Bp * maxp, dtype=jnp.int32).reshape(Bp, maxp) % NP
        lens = jnp.asarray([5, 130, 700, 1024], jnp.int32)
        out = _paged_attention(qq, kp, vp, lens, tbl, 1.0 / D ** 0.5)
        ref = _paged_attention_ref(qq, kp, vp, lens, tbl, 1.0 / D ** 0.5)
        return _rel(out, ref)
    guarded("paged_attention read", _paged_read, tol=0.05)

    # --- int8 training quantize kernels ------------------------------------
    from koifish_tpu.ops.pallas.quantize import colquant, rowquant
    x = jax.random.normal(jax.random.PRNGKey(8), (512, 1024), jnp.bfloat16)
    guarded("rowquant", lambda: (lambda q8, sx: _rel(
        q8.astype(jnp.float32) * sx, x.astype(jnp.float32)))(*rowquant(x)),
        tol=0.02)
    guarded("colquant", lambda: (lambda q8, sc_: _rel(
        q8.astype(jnp.float32) * sc_, x.astype(jnp.float32)))(*colquant(x)),
        tol=0.02)

    # --- fused classifier (lse/gold + dx/dw sweeps), bf16 + int8 ----------
    from koifish_tpu.ops.pallas import fused_ce as _fce
    Mf, Ef, Vf = 512, 256, 5000          # tail: 5000 % 1024 != 0
    hx = (jax.random.normal(jax.random.PRNGKey(11), (Mf, Ef)) * 0.3
          ).astype(jnp.bfloat16)
    hw = (jax.random.normal(jax.random.PRNGKey(12), (Ef, Vf)) * 0.02
          ).astype(jnp.bfloat16)
    tg = jax.random.randint(jax.random.PRNGKey(13), (Mf,), 0, Vf)
    tcol = tg[:, None].astype(jnp.int32)

    def _ce_ref():
        logits = jnp.dot(hx, hw, preferred_element_type=jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, tg[:, None], axis=1)[:, 0]
        return lse, gold

    def _fce_fwd():
        lr, gr = _ce_ref()
        lp, gp = _fce._fwd_call(hx, hw, tcol)
        return max(_rel(lp[:, 0], lr), _rel(gp[:, 0] + 1e-3, gr + 1e-3))
    guarded("fused_ce fwd", _fce_fwd, tol=0.01)

    def _fce_bwd():
        lp, _ = _fce._fwd_call(hx, hw, tcol)
        wt = jnp.full((Mf, 1), 1.0 / Mf, jnp.float32)
        dxp = _fce._dx_call(hx, hw, tcol, lp, wt)
        dwp = _fce._dw_call(hx, hw, tcol, lp, wt)

        def loss(a, b):
            logits = jnp.dot(a, b, preferred_element_type=jnp.float32)
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, tg[:, None], axis=1)[:, 0]
            return jnp.mean(lse - gold)
        gx, gw = jax.grad(loss, argnums=(0, 1))(hx, hw)
        return max(_rel(dxp, gx), _rel(dwp, gw))
    guarded("fused_ce dx/dw", _fce_bwd, tol=0.02)

    # --- fused classifier at WIDE E (32B head dims: E=5120, BV->512) ------
    Mw, Ew, Vw = 128, 5120, 4000
    wx = (jax.random.normal(jax.random.PRNGKey(21), (Mw, Ew)) * 0.3
          ).astype(jnp.bfloat16)
    ww = (jax.random.normal(jax.random.PRNGKey(22), (Ew, Vw)) * 0.01
          ).astype(jnp.bfloat16)
    wtg = jax.random.randint(jax.random.PRNGKey(23), (Mw,), 0, Vw)
    wtcol = wtg[:, None].astype(jnp.int32)

    def _fce_wide():
        logits = jnp.dot(wx, ww, preferred_element_type=jnp.float32)
        lr = jax.scipy.special.logsumexp(logits, axis=-1)
        lp, gp = _fce._fwd_call(wx, ww, wtcol)
        wt = jnp.full((Mw, 1), 1.0 / Mw, jnp.float32)
        dxp = _fce._dx_call(wx, ww, wtcol, lp, wt)
        dwp = _fce._dw_call(wx, ww, wtcol, lp, wt)

        def loss(a, b):
            lg = jnp.dot(a, b, preferred_element_type=jnp.float32)
            lse = jax.scipy.special.logsumexp(lg, axis=-1)
            gold = jnp.take_along_axis(lg, wtg[:, None], axis=1)[:, 0]
            return jnp.mean(lse - gold)
        gx, gw = jax.grad(loss, argnums=(0, 1))(wx, ww)
        return max(_rel(lp[:, 0], lr), _rel(dxp, gx), _rel(dwp, gw))
    guarded("fused_ce wide-E (5120)", _fce_wide, tol=0.02)

    # --- per-tile int8 dgrad ----------------------------------------------
    from koifish_tpu.ops.pallas.qdgrad import dgrad_int8_tile_or_none
    dyq = (jax.random.normal(jax.random.PRNGKey(14), (512, 2048)) * 0.1
           ).astype(jnp.bfloat16)
    wd0 = jax.random.normal(jax.random.PRNGKey(15), (256, 2048)) * 0.05
    swd = jnp.max(jnp.abs(wd0), axis=0, keepdims=True) / 127.0
    wqd = jnp.clip(jnp.round(wd0 / swd), -127, 127).astype(jnp.int8)

    def _qdg():
        got = dgrad_int8_tile_or_none(dyq, wqd, swd)
        assert got is not None
        wdd = (wqd.astype(jnp.float32) * swd).astype(jnp.bfloat16)
        ref = jnp.dot(dyq, wdd.T, preferred_element_type=jnp.float32)
        return _rel(got, ref)
    guarded("qdgrad int8 tile", _qdg, tol=0.02)

    print(f"\n{'ALL KERNELS OK' if not failures else 'FAILURES: ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
