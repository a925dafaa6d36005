"""``bubble`` — chat/inference CLI.

Usage: bubble --hf <model_dir> [--prompts "..." ...] [--bits 4]
              [--kv-bits 8] [--max-new 256] [--config cfg.json]

The analog of the reference's chat binary (src/bubble.cpp:60-72 →
Fish::Chat, GoPT.cpp:1111): quantize-at-load, ChatML prompt render,
streaming decode with per-turn tokens/s, answers appended to chat.csv.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="bubble")
    ap.add_argument("--hf", required=False, help="HF model dir")
    ap.add_argument("--config", default=None, help="JSON config")
    ap.add_argument("--prompts", nargs="*", default=None)
    ap.add_argument("--bits", type=int, default=0,
                    help="weight-only quant bits at load (0 = bf16)")
    ap.add_argument("--kv-bits", type=int, default=0, choices=[0, 4, 8])
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--top-k", type=int, default=50)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--metropolis", action="store_true",
                    help="GOPT_Metropolis sampling: CDF over the full "
                         "softmax of the raw logits (GoPT.cpp:516)")
    ap.add_argument("--approx-topk", action="store_true",
                    help="approximate top-k cut (lax.approx_max_k, recall "
                         "~0.95): ~10x faster than the exact sort on large "
                         "vocabs, slightly different sampled distribution")
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--csv", default="chat.csv")
    ap.add_argument("--decode-chunk", type=int, default=8,
                    help="decode steps per dispatch (eos checked per chunk;"
                         " amortizes the per-dispatch host RTT)")
    ap.add_argument("--think", action="store_true", help="enable thinking mode")
    ap.add_argument("--interactive", action="store_true",
                    help="multi-turn REPL on stdin (cache persists across turns)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways (weights + KV heads sharded)")
    ap.add_argument("--draft-hf", default=None,
                    help="draft model dir -> speculative decoding (exact "
                         "target distribution via rejection sampling)")
    ap.add_argument("--draft-k", type=int, default=4,
                    help="draft tokens per verify round")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.tp > 1:
        # latency-hiding scheduler + collective matmul (must precede
        # backend init) — parallel/overlap.py. CPU aborts on TPU flags.
        if args.device != "cpu":
            from koifish_tpu.parallel.overlap import enable_overlap_flags
            enable_overlap_flags()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from koifish_tpu.config import CLIParams, QuantCard, SamplerCard
    from koifish_tpu.data import BPETokenizer, render
    from koifish_tpu.dtypes import QFormat, qformat_from_bits
    from koifish_tpu.io import load_hf_model
    from koifish_tpu.quant.apply import quantize_params
    from koifish_tpu.serve import generate

    p = CLIParams.load(args.config) if args.config else CLIParams.from_json({})
    hf_dir = args.hf or p.hf_card
    if not hf_dir:
        print("bubble: --hf <model_dir> required", file=sys.stderr)
        return 2
    prompts = args.prompts if args.prompts is not None else p.prompts
    if not prompts:
        prompts = ["hello"]

    print(f"[bubble] loading {hf_dir} ...")
    t0 = time.time()
    mesh, streamed = None, False
    if hf_dir.endswith((".kun", ".ckp")):
        # reference single-file model (config embedded as msgpack tensor)
        from koifish_tpu.io.hf_loader import load_kun_model
        card, params, _kcfg = load_kun_model(hf_dir)
        tkdir = os.path.dirname(hf_dir) or "."
        hf_dir = tkdir   # chat-template / artifact paths are dir-relative
        if os.path.exists(os.path.join(tkdir, "tokenizer.dat")):
            from koifish_tpu.data.tokenizer import ScoreTokenizer
            tokenizer = ScoreTokenizer.from_tokenizer_dat(
                os.path.join(tkdir, "tokenizer.dat"))
        else:
            tokenizer = BPETokenizer.from_file(tkdir)
    else:
        if args.tp > 1 and args.bits:
            # big-model path (Qwen3-32B on a TP mesh): stream each tensor
            # mmap -> quantize -> shard — the full bf16 model never
            # materializes (io/stream_load; reference LoadFolderOfST
            # quantize-at-load, Serialize.cpp:1018)
            try:
                from koifish_tpu.io.stream_load import \
                    load_hf_sharded_quantized
                from koifish_tpu.parallel.mesh import make_mesh
                mesh = make_mesh({"tp": args.tp})
                qc = QuantCard.from_json({
                    "self_attn": {"bits": args.bits},
                    "mlp": {"bits": args.bits}})
                card, params = load_hf_sharded_quantized(hf_dir, mesh, qc)
                streamed = True
                print(f"[bubble] streamed sharded quantize-at-load "
                      f"({args.bits}-bit, tp={args.tp})")
            except NotImplementedError:   # GPT2/MoE: classic path below
                mesh = None
                card, params = load_hf_model(hf_dir)
        else:
            card, params = load_hf_model(hf_dir)
        tokenizer = BPETokenizer.from_file(hf_dir)
    print(f"[bubble] {card.arch} {card.n_layer}L loaded in {time.time()-t0:.1f}s "
          f"on {jax.default_backend()}")

    draft_card = draft_params = None
    if args.draft_hf:
        draft_card, draft_params = load_hf_model(args.draft_hf)
        print(f"[bubble] draft {draft_card.arch} {draft_card.n_layer}L "
              f"(k={args.draft_k}, greedy/lossless)")

    if args.bits and not streamed:
        qc = QuantCard.from_json({
            "self_attn": {"bits": args.bits}, "mlp": {"bits": args.bits}})
        t0 = time.time()
        params = quantize_params(params, qc, card)
        print(f"[bubble] quantize-at-load {args.bits}-bit in {time.time()-t0:.1f}s")

    kv_fmt = QFormat.BF16 if not args.kv_bits else qformat_from_bits(args.kv_bits)
    sampler = SamplerCard(temperature=args.temperature, top_k=args.top_k,
                          top_p=args.top_p, max_new_tokens=args.max_new,
                          approx_top_k=args.approx_topk,
                          method="metropolis" if args.metropolis else "topk")
    eos = tokenizer.token_id("<|im_end|>") or tokenizer.token_id("<|endoftext|>") or -1

    from koifish_tpu.serve import cache_for
    from koifish_tpu.serve.stacked import stack_layers

    if args.tp > 1 and not streamed:
        from koifish_tpu.parallel.mesh import make_mesh
        from koifish_tpu.parallel import shard_params
        mesh = make_mesh({"tp": args.tp})
        params = shard_params(params, mesh)
        print(f"[bubble] tensor-parallel over {args.tp} devices")
    dparams = stack_layers(params)   # layer-scan decode when homogeneous

    rows = []

    def one_turn(prompt, cache, first_turn=True):
        """Run one chat turn; returns (answer, cache) — the cache carries
        the conversation for multi-turn REPL use."""
        text = render([{"role": "user", "content": prompt}], hf_dir, card.arch,
                      enable_thinking=args.think)
        ids = tokenizer.encode(text)
        if cache is None:
            size = max(args.ctx, len(ids) + args.max_new)
            cache = cache_for(card, 1, size, fmt=kv_fmt)
            if mesh is not None:
                from koifish_tpu.parallel.sharding import shard_cache
                cache = shard_cache(cache, mesh)
        t0 = time.time()
        if args.draft_hf:
            from koifish_tpu.serve.speculative import speculative_generate
            dc = cache_for(draft_card, 1, size, fmt=QFormat.BF16)
            toks, stats = speculative_generate(
                card, params, draft_card, draft_params,
                jnp.asarray([ids], jnp.int32), cache, dc, k=args.draft_k,
                max_new_tokens=args.max_new, eos_id=eos, sampler=sampler)
            print(f"[bubble] speculative: {stats['rounds']} rounds, "
                  f"accept_rate={stats['accept_rate']:.2f}")
        else:
            toks, cache = generate(card, params, jnp.asarray([ids], jnp.int32),
                                   cache, sampler, max_new_tokens=args.max_new,
                                   eos_id=eos, decode_params=dparams,
                                   decode_chunk=args.decode_chunk)
        dt = time.time() - t0
        out_ids = [t for t in toks[0].tolist() if t != eos]
        answer = tokenizer.decode(out_ids)
        tks = len(out_ids) / dt if dt > 0 else 0.0
        print(f"\n>>> {prompt}\n{answer}\n[{tks:.2f} tk/s, "
              f"{len(ids)} prompt + {len(out_ids)} new]")
        rows.append((prompt, answer, f"{tks:.2f}"))
        return answer, cache

    if args.interactive:
        cache = None
        print("[bubble] interactive mode — empty line to exit")
        while True:
            try:
                prompt = input("you> ").strip()
            except EOFError:
                break
            if not prompt:
                break
            try:
                _, cache = one_turn(prompt, cache)
            except Exception as e:  # cache overflow etc: restart conversation
                print(f"[bubble] {type(e).__name__}: {e}; resetting context")
                cache = None
    else:
        for prompt in prompts:
            one_turn(prompt, None)

    if args.csv:
        new = not os.path.exists(args.csv)
        with open(args.csv, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["prompt", "answer", "tokens_per_sec"])
            w.writerows(rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
