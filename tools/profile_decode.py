"""On-chip op breakdown of the layered decode step (Qwen3-0.6B INT4+INT8KV).

Usage: python tools/profile_decode.py [--batch 32] [--steps 32]
Prints wall per token, then the xplane-derived top ops.
"""
import collections
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _arg(flag, default):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


def main():
    from koifish_tpu.config import ModelCard, QuantCard, SamplerCard
    from koifish_tpu.dtypes import QFormat
    from koifish_tpu.models import init_params
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.serve import init_cache
    from koifish_tpu.serve.engine import (_jit_decode_sample_layered_k,
                                          _jit_prefill, _jit_split_cache)
    from koifish_tpu.serve.stacked import stack_layers
    from koifish_tpu.ops.sampling import sample_logits

    card = ModelCard.from_arch(
        "QWEN3", vocab_size=151936, n_layer=28, n_embd=1024, n_head=16,
        n_kv_head=8, head_dim=128, n_ffn=3072, n_ctx=1024, max_pos=32768)
    B = int(_arg("--batch", 32))
    S, P, K = 1024, 128, 16
    params = init_params(card, jax.random.PRNGKey(0))
    qc = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                              "group_size": 128})
    params = quantize_params(params, qc, card)
    dparams = stack_layers(params) or params
    sampler = SamplerCard(temperature=0.6)
    cache = init_cache(card.n_layer, B, S, card.n_kv_head, card.head_dim,
                       fmt=QFormat.INT8)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                                card.vocab_size, dtype=jnp.int32)
    rng = jax.random.PRNGKey(0)
    logits, cache = _jit_prefill(card, params, prompt, cache, fresh=True)
    tok = sample_logits(rng, logits, sampler.temperature, sampler.top_k,
                        sampler.top_p)
    int(tok[0])
    lc = _jit_split_cache(cache, uniform=True)
    toks, lc, rng = _jit_decode_sample_layered_k(
        card, dparams, tok, lc, rng, sampler, K, streaming=False)
    tok = toks[-1]
    int(tok[0])

    N = max(int(_arg("--steps", 32)) // K, 2)
    t0 = time.perf_counter()
    for _ in range(N):
        toks, lc, rng = _jit_decode_sample_layered_k(
            card, dparams, tok, lc, rng, sampler, K, streaming=False)
        tok = toks[-1]
    int(tok[0])
    dt = (time.perf_counter() - t0) / (N * K)
    print(f"wall: {dt*1e3:.2f} ms/token  {B/dt:.1f} tok/s")

    outdir = "/tmp/prof_decode"
    jax.profiler.start_trace(outdir)
    toks, lc, rng = _jit_decode_sample_layered_k(
        card, dparams, tok, lc, rng, sampler, K, streaming=False)
    int(toks[-1][0])
    jax.profiler.stop_trace()

    path = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = [e for e in t["traceEvents"] if e.get("ph") == "X"]
    agg = collections.Counter()
    long = {}
    for e in ev:
        name = e["name"]
        if name.startswith(("$", "Pjit", "jit_", "np.", "Device",
                            "Parse", "Python", "PJRT")):
            continue
        agg[name[:90]] += e.get("dur", 0)
        args = e.get("args") or {}
        if args.get("long_name"):
            long[name[:90]] = args["long_name"][:160]
    jit_total = sum(e.get("dur", 0) for e in ev if e["name"].startswith("jit_"))
    print(f"device jit total: {jit_total/K/1e3:.2f} ms/token over {K} tokens")
    for name, dur in agg.most_common(35):
        print(f"{dur/K/1e3:9.3f} ms  {name}")
        if name in long:
            print(f"             {long[name]}")


if __name__ == "__main__":
    main()
