"""``pangpi`` — evaluation CLI (HellaSwag / perplexity).

The analog of the reference's eval binary (src/pangpi.cpp:8-11,
``--hellaswag`` flag CLI_params.cpp:1494-1500).

Usage: pangpi --hf <model_dir> --hellaswag <shard.bin> [--max N]
       pangpi --hf <model_dir> --ppl "<shards_glob>" [--bits 4]
"""
from __future__ import annotations

import argparse
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="pangpi")
    ap.add_argument("--hf", required=True)
    ap.add_argument("--hellaswag", default=None, help="hellaswag shard .bin")
    ap.add_argument("--ppl", default=None, help="token-shard glob for ppl")
    ap.add_argument("--bits", type=int, default=0)
    ap.add_argument("--max", type=int, default=0, help="cap samples/batches")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"])
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from koifish_tpu.config import QuantCard
    from koifish_tpu.data import TokenDataset, read_hellaswag_shard
    from koifish_tpu.evaluate import hellaswag_accuracy, perplexity
    from koifish_tpu.io import load_hf_model
    from koifish_tpu.quant.apply import quantize_params

    card, params = load_hf_model(args.hf)
    if args.bits:
        qc = QuantCard.from_json({
            "self_attn": {"bits": args.bits}, "mlp": {"bits": args.bits}})
        params = quantize_params(params, qc, card)

    ran = False
    if args.hellaswag:
        t0 = time.time()
        acc = hellaswag_accuracy(card, params,
                                 read_hellaswag_shard(args.hellaswag),
                                 max_samples=args.max)
        print(f"hellaswag acc={acc:.4f} ({time.time()-t0:.0f}s)")
        ran = True
    if args.ppl:
        ds = TokenDataset(args.ppl)
        ce, ppl = perplexity(card, params,
                             ds.batches(args.batch, card.n_ctx),
                             max_batches=args.max)
        print(f"ppl={ppl:.4f} ce={ce:.4f}")
        ran = True
    if not ran:
        print("pangpi: nothing to do (--hellaswag or --ppl)", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
