"""Benchmark driver — prints ONE final JSON line (plus earlier partial lines).

Headline metric (BASELINE.md): GPT2-124M pretraining throughput,
tokens/sec/chip, vs the reference's ~140k tok/s on 1x RTX 4090
(reference README.md:11). Runs on whatever jax.default_backend() is —
the real TPU chip under the driver.

Resilience contract (this file must never lose a round's evidence):
- the default mode is an ORCHESTRATOR that runs the train and decode
  sections in separate subprocesses, so a crash/hang in one cannot take
  down the other;
- TPU-backend init failures ("Unable to initialize backend") are retried
  with bounded backoff — a fresh subprocess retries init from scratch,
  sidestepping JAX's in-process caching of backend-init errors;
- every exit path prints valid JSON: on failure the line carries an
  "error" field and `"value": null`, never a bare traceback;
- the train result line is printed the moment it exists, BEFORE decode
  starts, so a later crash can't erase it; the final combined line is
  printed last (a consumer that takes the last JSON line gets everything).

Usage: python bench.py [--mode all|train|decode] [--model gpt2-124m|qwen3-0.6b]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

BASELINE_TOKS = 140_000.0  # GPT2-124M on 4090, reference README.md:11

# Retry schedule for a failed/hung section subprocess. Backend-init flakes
# (the exact failure that erased BENCH_r02: "Unable to initialize backend
# 'axon': UNAVAILABLE") are transient tunnel conditions — waiting and
# retrying in a FRESH process is the only reliable recovery because JAX
# caches a failed backend init for the life of the process.
RETRY_DELAYS_S = tuple(
    float(d) for d in os.environ.get(
        "KOIFISH_BENCH_RETRY_DELAYS", "0,20,60,120").split(","))
SECTION_TIMEOUT_S = float(
    os.environ.get("KOIFISH_BENCH_SECTION_TIMEOUT", "1200"))
# hard wall for the WHOLE orchestrator: with a dead tunnel every attempt
# hangs to its full section timeout, and unbounded retries would burn
# hours of driver budget producing nothing
TOTAL_DEADLINE_S = float(
    os.environ.get("KOIFISH_BENCH_TOTAL_DEADLINE", "3600"))


def _gpt2_124m():
    from koifish_tpu.config import ModelCard
    return ModelCard.from_arch(
        "GPT2", vocab_size=50304,  # padded to 128-multiple for MXU tiling
        n_layer=12, n_embd=768, n_head=12, n_kv_head=12, head_dim=64,
        n_ffn=3072, n_ctx=1024, max_pos=1024)


def _qwen3_0_6b():
    from koifish_tpu.config import ModelCard
    return ModelCard.from_arch(
        "QWEN3", vocab_size=151936, n_layer=28, n_embd=1024, n_head=16,
        n_kv_head=8, head_dim=128, n_ffn=3072, n_ctx=1024, max_pos=32768)


def bench_decode(args, emit=True):
    """Decode throughput: Qwen3-0.6B INT4 weights + INT8 KV, batched decode.
    tokens/sec/chip + p50 TTFT (BASELINE.json serving metrics)."""
    import jax
    import jax.numpy as jnp
    from koifish_tpu.config import QuantCard, SamplerCard
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.models import init_params
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.serve import init_layered_cache
    from koifish_tpu.serve.engine import (jit_decode_sample_layered,
                                          jit_decode_sample_layered_k,
                                          jit_prefill)
    from koifish_tpu.serve.stacked import stack_layers
    from koifish_tpu.ops.sampling import sample_logits

    card = _qwen3_0_6b()
    params = init_params(card, jax.random.PRNGKey(0))
    qc = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                              "group_size": 128})
    params = quantize_params(params, qc, card)
    dparams = stack_layers(params) or params   # layer-scan decode
    B, S, P = args.batch, 1024, 128
    sampler = SamplerCard(temperature=0.6)
    # cache born per-layer (r5): no [L,...] stacked form or split copy
    # anywhere on the measured path — the exact production shape
    # (cache_for(layered=True) / generate)
    cache = init_layered_cache(card.n_layer, B, S, card.n_kv_head,
                               card.head_dim, fmt=QFormat.INT8)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                card.vocab_size, dtype=jnp.int32)
    rng = jax.random.PRNGKey(0)

    # cold prefill = compile; warm prefill = the real TTFT. fresh=True is
    # what the engine picks for an empty cache (engine.generate checks
    # cache.pos == 0): in-chunk flash attention, no masked full-cache read.
    # The sampler is warmed too — its first eager dispatch compiles.
    logits, cache = jit_prefill(card, params, prompt, cache, fresh=True)
    tok = sample_logits(rng, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p)
    int(tok[0])
    cache = init_layered_cache(card.n_layer, B, S, card.n_kv_head,
                               card.head_dim, fmt=QFormat.INT8)
    jax.block_until_ready(cache.k)   # allocation must not leak into TTFT
    t0 = time.perf_counter()
    logits, cache = jit_prefill(card, params, prompt, cache, fresh=True)
    tok = sample_logits(rng, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p)
    int(tok[0])  # sync
    ttft_warm = time.perf_counter() - t0

    # warm decode over the per-layer cache (serve/layered.py — in-place
    # slot writes). Production path = chunked dispatch (serve/batching.py
    # decode_chunk): K decode+sample steps per executable — on this
    # tunneled runtime a per-token dispatch measures the ~30 ms host RTT,
    # not the chip (121 vs 269 agg tok/s in the serving bench).
    lc = cache                  # already layered — nothing to split
    K = 16
    # pre-wrap dispatch (pos + K <= S): sink re-rope compiled out — the
    # same host-side rule engine.generate applies per chunk
    toks, lc, rng = jit_decode_sample_layered_k(card, dparams, tok, lc,
                                                 rng, sampler, K,
                                                 streaming=False)
    tok = toks[-1]
    int(tok[0])
    N = max(args.steps // K, 2)
    t0 = time.perf_counter()
    for _ in range(N):
        toks, lc, rng = jit_decode_sample_layered_k(card, dparams, tok, lc,
                                                     rng, sampler, K,
                                                     streaming=False)
        tok = toks[-1]
    int(tok[0])  # true sync (host fetch)
    dt = (time.perf_counter() - t0) / (N * K)

    # per-token dispatch (host-RTT-bound here; real interactive floor)
    tok, lc, rng = jit_decode_sample_layered(card, dparams, tok, lc, rng,
                                              sampler, streaming=False)
    int(tok[0])
    t0 = time.perf_counter()
    for _ in range(8):
        tok, lc, rng = jit_decode_sample_layered(card, dparams, tok, lc,
                                                  rng, sampler,
                                                  streaming=False)
    int(tok[0])
    dt1 = (time.perf_counter() - t0) / 8
    tps = B / dt
    result = {
        "metric": f"qwen3-0.6b INT4+INT8KV decode (B={B}, S={S}, chunk={K})",
        "value": round(tps, 1),
        "unit": "tokens/sec/chip",
        # the reference publishes NO decode tok/s (BASELINE.md note) — this
        # is the rebuild's OWN baseline, so there is no honest ratio to emit
        "vs_baseline": None,
        "baseline_anchor": "none: reference publishes no decode tok/s "
                           "(BASELINE.md); own-baseline metric",
        "ttft_warm_s": round(ttft_warm, 3),
        "step_ms": round(dt * 1e3, 2),
        "per_token_dispatch_ms": round(dt1 * 1e3, 2),
    }
    if emit:
        print(json.dumps(result), flush=True)
    return result


def bench_train(args, emit=True):
    import jax
    import jax.numpy as jnp
    from koifish_tpu.config import TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    card = _gpt2_124m() if args.model == "gpt2-124m" else _qwen3_0_6b()
    # measured fastest configs (sweep r2): gpt2-124m B=32 no-remat
    # 150.3K (B=16 145.8K, B=48 150.7K, B=64 spills); qwen3-0.6b B=8
    # no-remat 23.7K > dots 22.6K > full 19.9K tok/s
    if args.batch == 16:   # default: substitute the per-model best
        args.batch = 32 if args.model == "gpt2-124m" else 8
    remat = False if args.batch <= 8 else "dots"
    if args.model == "gpt2-124m":
        remat = False
    tcard = TrainCard(batch=args.batch, lr=6e-4, warmup=10, optimizer="adamw",
                      remat=remat)
    step = make_train_step(card, tcard, total_steps=1000)
    state = init_train_state(card, tcard)

    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, args.batch, args.ctx + 1), 0,
                                card.vocab_size, dtype=jnp.int32)
    batch = {"tokens": tokens}

    # warmup/compile. NB: block_until_ready can return early on remote
    # (tunneled) runtimes — a host fetch (float()) is the only true sync.
    # Extra warm steps + best-of-2 windows: the round-1 driver measured
    # 108.9K where steady state is ~117K — cold tunnel dispatch on the
    # first window skews a single measurement.
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    best_dt, final_loss = float("inf"), 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        # the final loss depends on the whole donated-state chain, so this
        # fetch forces completion of every step above
        final_loss = float(metrics["loss"])
        best_dt = min(best_dt, (time.perf_counter() - t0) / args.steps)
    dt = best_dt
    assert 0.0 < final_loss < 100.0

    toks_per_sec = args.batch * args.ctx / dt
    # per-model anchor: gpt2-124m vs README.md:11's ~140K; qwen3-0.6b vs
    # tutorial_qwen3.md §5's ~20K (a 140K anchor there would be a fake
    # cross-model ratio in a driver artifact)
    anchor = BASELINE_TOKS if args.model == "gpt2-124m" else 20_000.0
    result = {
        "metric": f"{args.model} pretrain throughput (1 chip, B={args.batch}, "
                  f"ctx={args.ctx}, bf16{', remat' if remat else ''})",
        "value": round(toks_per_sec, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(toks_per_sec / anchor, 3),
    }
    if emit:
        print(json.dumps(result), flush=True)
    return result


def bench_bigmodels(emit=True):
    """GPT2-774M and 1558M training throughput in ONE process (TPU init
    and compile-cache amortized) — driver-verified evidence for the
    big-model rows of PARITY.md. Tuned configs from tools/sweep_r4.py:
    774M B=16 no-remat, 1558M B=16 full remat; both int8 fwd GEMMs +
    Pallas fused classifier + bf16 Adam moments. Reference anchors:
    774M ~70K claimed (README.md:12), 1558M 22.1K measured
    (cases/gpt2/1558M_F8_B80/F8_B80.info)."""
    import jax
    import jax.numpy as jnp
    from koifish_tpu.config import ModelCard, TrainCard
    from koifish_tpu.train.trainer import init_train_state, make_train_step

    dims = {
        "774m": (dict(n_layer=36, n_embd=1280, n_head=20, n_ffn=5120),
                 False, 8, 70_000.0),
        "1558m": (dict(n_layer=48, n_embd=1600, n_head=25, n_ffn=6400),
                  True, 4, 22_100.0),
    }
    result = {"metric": "gpt2-774m/1558m pretrain throughput (1 chip, "
                        "B=16, int8 fwd + fused-CE kernels, bf16 moments)",
              "unit": "tokens/sec/chip"}
    for name, (d, remat, reps, anchor_tps) in dims.items():
        card = ModelCard.from_arch("GPT2", vocab_size=50304,
                                   n_kv_head=d["n_head"], head_dim=64,
                                   n_ctx=1024, max_pos=1024, **d)
        tcard = TrainCard(batch=16, lr=6e-4, warmup=10, optimizer="adamw",
                          moment_dtype="bf16", remat=remat,
                          int8_matmul=True, int8_min_kn=4 << 20,
                          fused_ce=True)
        step = make_train_step(card, tcard, total_steps=1000)
        state = init_train_state(card, tcard)
        tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 16, 1025),
                                    0, card.vocab_size, jnp.int32)
        batch = {"tokens": tokens}
        for _ in range(3):
            state, m = step(state, batch)
        l0 = float(m["loss"])
        assert 0.0 < l0 < 100.0
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = step(state, batch)
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        # quality gate on the shipped int8 recipe (VERDICT r4 weak #3):
        # random-token loss must stay under ln(V)+slack and not climb
        assert loss == loss and 0.0 < loss < 11.5, f"{name} loss {loss}"
        assert loss <= l0 + 0.05, f"{name} loss climbed {l0} -> {loss}"
        tps = 16 * 1024 / dt
        result[f"gpt2_{name}_tok_s"] = round(tps, 1)
        result[f"gpt2_{name}_vs_ref"] = round(tps / anchor_tps, 3)
        result[f"gpt2_{name}_loss"] = round(loss, 3)
        del state, step
    if emit:
        print(json.dumps(result), flush=True)
    return result


def _run_section(mode: str, extra: list[str], deadline: float,
                 delays=RETRY_DELAYS_S) -> dict:
    """Run one bench section in a subprocess with bounded retries.

    A fresh process per attempt is deliberate: JAX caches a failed
    backend init for the life of the process, so in-process retry of
    the BENCH_r02 failure mode can never succeed. `deadline` is an
    absolute time.monotonic() wall — no attempt starts with <60s left.
    Returns the section's JSON dict, or {"error": ...} after all retries.
    """
    last_err = "unknown"
    for i, delay in enumerate(delays):
        if delay:
            print(f"[bench] retrying {mode} in {delay}s "
                  f"(attempt {i + 1}/{len(delays)}): {last_err[:160]}",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
        budget = deadline - time.monotonic()
        if budget < 60:
            last_err += " (total bench deadline reached)"
            break
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--mode", mode, *extra],
                capture_output=True, text=True,
                timeout=min(SECTION_TIMEOUT_S, budget),
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired:
            last_err = (f"{mode} section timed out after "
                        f"{min(SECTION_TIMEOUT_S, budget):.0f}s")
            continue
        except Exception as e:  # spawn failure — not retryable by waiting
            last_err = f"spawn failed: {e!r}"
            break
        # take the LAST parseable JSON line of stdout
        result = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                cand = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(cand, dict):
                result = cand
                break
        if proc.returncode == 0 and result is not None:
            return result
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        last_err = (f"rc={proc.returncode}: " +
                    " | ".join(tail[-3:]))[:500] if tail else \
                   f"rc={proc.returncode}, no output"
    return {"error": f"{mode} failed after {len(delays)} attempts: "
                     f"{last_err}"}


def _orchestrate(args) -> None:
    """Default mode: both sections, each fault-isolated, JSON no matter what.

    Prints the train line as soon as it exists, then the final combined
    line. Exits 0 on every path."""
    deadline = time.monotonic() + TOTAL_DEADLINE_S
    extra = ["--model", args.model, "--steps", str(args.steps),
             "--ctx", str(args.ctx)]
    if args.batch != 16:
        extra += ["--batch", str(args.batch)]
    train = _run_section("train", extra, deadline)
    # partial line FIRST: a decode-side crash can no longer erase this
    print(json.dumps(train), flush=True)

    decode = _run_section("decode", ["--steps", "64", "--batch", "32"],
                          deadline)
    # the large-batch point (single attempt): B=128 decode OOM'd before
    # round 5's layered-born caches removed the 2x-KV admission
    # transient — 5661 vs 4936 (B=64) vs 4334 (B=32) agg tok/s measured
    decode128 = _run_section("decode", ["--steps", "64", "--batch", "128"],
                             deadline, delays=(0.0,))

    final = dict(train) if "value" in train else {
        "metric": f"{args.model} pretrain throughput (1 chip)",
        "value": None, "unit": "tokens/sec/chip", "vs_baseline": None,
        "error": train.get("error", "train section produced no result"),
    }
    if "error" in decode:
        final["decode_error"] = decode["error"][:300]
    else:
        final["decode_tok_s"] = decode.get("value")
        final["decode_metric"] = decode.get("metric")
        final["decode_step_ms"] = decode.get("step_ms")
        final["ttft_warm_s"] = decode.get("ttft_warm_s")
    if "error" not in decode128:
        final["decode_b128_tok_s"] = decode128.get("value")
        final["decode_b128_step_ms"] = decode128.get("step_ms")
    # second partial line: headline + decode are now safe on record
    print(json.dumps(final), flush=True)

    # big-model training evidence (GPT2-774M/1558M in ONE subprocess —
    # TPU init amortized). Single attempt, runs LAST: a failure or the
    # total deadline cannot erase anything above.
    if time.monotonic() + 240 < deadline:
        big = _run_section("bigmodels", [], deadline, delays=(0.0,))
        if "error" in big:
            final["bigmodels_error"] = big["error"][:300]
        else:
            final["gpt2_774m_tok_s"] = big.get("gpt2_774m_tok_s")
            final["gpt2_774m_vs_ref"] = big.get("gpt2_774m_vs_ref")
            final["gpt2_1558m_tok_s"] = big.get("gpt2_1558m_tok_s")
            final["gpt2_1558m_vs_ref"] = big.get("gpt2_1558m_vs_ref")
        print(json.dumps(final), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=["all", "train", "decode", "bigmodels"])
    ap.add_argument("--model", default="gpt2-124m")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()
    # smoke-test hook: the axon sitecustomize overrides JAX_PLATFORMS, so
    # only a jax.config update can steer a worker onto the CPU backend
    plat = os.environ.get("KOIFISH_BENCH_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    if args.mode == "decode":
        if args.batch == 16:   # decode default: best measured config
            args.batch = 32
        bench_decode(args)
        return
    if args.mode == "bigmodels":
        bench_bigmodels()
        return
    if args.mode == "train":
        bench_train(args)
        return
    try:
        _orchestrate(args)
    except Exception as e:  # the orchestrator itself must never leak rc=1
        print(json.dumps({"metric": "bench orchestrator", "value": None,
                          "unit": "tokens/sec/chip", "vs_baseline": None,
                          "error": repr(e)[:500]}), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()
