"""In-step A/B of the INT8 decode-GEMV flavor (mxu vs bf16-dot).

The two advisory micro-timings disagree across runtime versions (r3:
mxu 611 < dot 692 us; r5 smoke: dot 545.6 < mxu 697.8 us) — only the
real decode step settles the dispatch default. Runs bench.py's decode
section with INT8 weight quantization (instead of the INT4 production
config) under the current KOIFISH_INT8_GEMV setting; launch twice:

    KOIFISH_INT8_GEMV=mxu python -u tools/decode_int8_ab.py
    KOIFISH_INT8_GEMV=dot python -u tools/decode_int8_ab.py
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    flavor = os.environ.get("KOIFISH_INT8_GEMV", "mxu")
    # swap the decode section's quant card to INT8 weights
    orig_from_json = None
    from koifish_tpu.config import QuantCard
    orig_from_json = QuantCard.from_json.__func__

    def int8_card(cls, spec):
        spec = {"self_attn": {"bits": 8}, "mlp": {"bits": 8},
                "group_size": 128}
        return orig_from_json(cls, spec)

    QuantCard.from_json = classmethod(int8_card)
    args = types.SimpleNamespace(batch=32, steps=64, model="qwen3-0.6b")
    r = bench.bench_decode(args, emit=False)
    print(f"INT8-GEMV={flavor}: {r['value']} agg tok/s, "
          f"step {r['step_ms']} ms, ttft {r['ttft_warm_s']} s", flush=True)


if __name__ == "__main__":
    main()
