"""Round-4 decode sweep: KV format (INT8 vs packed INT4) x batch, on the
layered scan decode path. One process, chunked dispatch (K=16).

Usage: python tools/sweep_decode_r4.py
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

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
params = init_params(card, jax.random.PRNGKey(0))
qc = QuantCard.from_json({"self_attn": {"bits": 4}, "mlp": {"bits": 4},
                          "group_size": 128})
params = quantize_params(params, qc, card)
dparams = stack_layers(params) or params
sampler = SamplerCard(temperature=0.6)
S, P, K = 1024, 128, 16

def run(B, fmt, steps=64):
    label = f"B={B} kv={fmt.name}"
    try:
        cache = init_cache(card.n_layer, B, S, card.n_kv_head,
                           card.head_dim, fmt=fmt)
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
        N = max(steps // K, 2)
        t0 = time.perf_counter()
        for _ in range(N):
            toks, lc, rng = _jit_decode_sample_layered_k(
                card, dparams, tok, lc, rng, sampler, K, streaming=False)
            tok = toks[-1]
        int(tok[0])
        dt = (time.perf_counter() - t0) / (N * K)
        print(f"{label}: {B/dt:.1f} tok/s  ({dt*1e3:.2f} ms/step)",
              flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

run(32, QFormat.INT8)       # r3 bench config (4334 tok/s driver-witnessed)
run(32, QFormat.INT4)
run(64, QFormat.INT8)
run(64, QFormat.INT4)
run(128, QFormat.INT8)
run(128, QFormat.INT4)
