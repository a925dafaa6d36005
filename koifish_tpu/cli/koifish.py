"""``koifish`` — training/SFT/QAT CLI.

Usage: koifish <config.json> [--most-iter N] [--hf DIR] [--device cpu|tpu]

The analog of the reference's train binary (src/koifish.cpp:29-60 →
Fish::Train → Optimizer::Search). One JSON config is the product surface
(reference README.md:26); reference config files parse directly.
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="koifish")
    ap.add_argument("config", help="JSON config (reference schema)")
    ap.add_argument("--most-iter", type=int, default=None,
                    help="cap training iterations (debug.most_iter)")
    ap.add_argument("--hf", default=None, help="HF model dir (load weights)")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--out-dir", default=".", help="loss CSV / checkpoint dir")
    ap.add_argument("--dp", type=int, default=1, help="data-parallel ways")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel ways")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel ways (ring attention over an "
                         "sp mesh axis; ctx must divide)")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline stages (GPipe microbatch schedule)")
    ap.add_argument("--n-micro", type=int, default=0,
                    help="pipeline microbatches (default: 2*pp)")
    ap.add_argument("--pp-schedule", default="1f1b",
                    choices=["1f1b", "gpipe"],
                    help="pipeline schedule: 1f1b (O(P) activation "
                         "memory, default) or gpipe (AD over the loop)")
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params+moments over dp (ZeRO-3 analog)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint to resume from (params+moments+step)")
    ap.add_argument("--wandb", default=None, metavar="PROJECT",
                    help="log to Weights & Biases (reference gates this "
                         "behind _USE_WANDB_; here it's a runtime flag)")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.tp > 1 or args.dp > 1 or args.pp > 1:
        # latency-hiding scheduler + collective matmul (must precede
        # backend init) — parallel/overlap.py. CPU aborts on TPU flags.
        if args.device != "cpu":
            from koifish_tpu.parallel.overlap import enable_overlap_flags
            enable_overlap_flags()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    # multi-host: JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID env
    # (or the koifish-multihost launcher) -> jax.distributed; devices
    # become the global set, data is fed per host below
    from koifish_tpu.parallel.multihost import init_distributed
    if init_distributed():
        print(f"[koifish] distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")

    from koifish_tpu.config import CLIParams
    from koifish_tpu.data import TokenDataset
    from koifish_tpu.evaluate import perplexity
    from koifish_tpu.io import load_hf_model, save_train_state
    from koifish_tpu.train.trainer import init_train_state, train_loop

    p = CLIParams.load(args.config)
    if args.hf:
        p.hf_card = args.hf
    if args.most_iter is not None:
        p.train.most_iter = args.most_iter
    card, tcard = p.model, p.train

    params = None
    if p.hf_card:
        print(f"[koifish] loading HF weights from {p.hf_card}")
        card, params = load_hf_model(p.hf_card, card)

    # SFT method wiring (LoRA adapters / trainable masks; SFT_CARD analog)
    trainable = None
    if p.sft is not None and params is not None:
        from koifish_tpu.train.lora import add_lora, trainable_mask
        if p.sft.method == "lora":
            params = add_lora(params, p.sft, jax.random.PRNGKey(p.seed))
        if p.sft.method != "full":
            trainable = trainable_mask(params, p.sft.method)
        print(f"[koifish] SFT method={p.sft.method}")

    state = init_train_state(card, tcard, params=params)
    resume_path = args.resume or p.checkpoint_in
    if resume_path:
        from koifish_tpu.io import load_train_state
        state, meta = load_train_state(resume_path, state)
        print(f"[koifish] resumed from {resume_path} "
              f"(step {int(state.opt.step)})")
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"[koifish] arch={card.arch} layers={card.n_layer} "
          f"params={n_params/1e6:.1f}M device={jax.default_backend()}")
    if tcard.nn_structure:    # DUMP_SWITCH.nn_structure analog
        from koifish_tpu.utils.dump import model_structure
        print(model_structure(state.params))

    train_ds = p.datasets.get("train")
    if train_ds is None or not train_ds.glob:
        print("[koifish] no train dataset in config", file=sys.stderr)
        return 2
    if train_ds.kind in ("OAI_message", "jsonl", "ChatML") and \
            train_ds.glob.endswith(".jsonl"):
        from koifish_tpu.data import BPETokenizer
        from koifish_tpu.data.sft import SFTDataset
        tok = BPETokenizer.from_file(p.hf_card)
        sds = SFTDataset.from_jsonl(train_ds.glob, tok, card.n_ctx)
        total_steps = max(len(sds) // tcard.batch, 1) * tcard.epochs
        batches = sds.batches(tcard.batch, seed=p.seed, epochs=tcard.epochs,
                              accum=tcard.grad_accum)
        print(f"[koifish] SFT: {len(sds)} conversations, {total_steps} steps")
    else:
        ds = TokenDataset(train_ds.glob, most=train_ds.most)
        steps_per_epoch = max(ds.total // (tcard.batch * card.n_ctx), 1)
        total_steps = steps_per_epoch * tcard.epochs
        batches = ds.batches(tcard.batch, card.n_ctx, seed=p.seed,
                             epochs=tcard.epochs, accum=tcard.grad_accum)
        print(f"[koifish] {ds.total/1e6:.1f}M tokens, {total_steps} steps "
              f"(B={tcard.batch}, ctx={card.n_ctx}, accum={tcard.grad_accum})")

    eval_cards = [d for k, d in p.datasets.items() if k.startswith("eval")]

    eval_csv = os.path.join(args.out_dir, "Eval.csv")
    eval_state = {"best": float("inf"), "last": float("inf"),
                  "no_improve": 0}

    def eval_fn(st, it):
        for d in eval_cards:
            if d.kind == "hellaswag":
                continue  # pangpi handles hellaswag
            try:
                eds = TokenDataset(d.glob, most=max(d.most, 1))
            except FileNotFoundError:
                continue
            ce, ppl = perplexity(card, st.params,
                                 eds.batches(tcard.batch, card.n_ctx),
                                 max_batches=max(int(8 * d.samp * 10), 2))
            # overfit / no-improvement heuristics (UpdateStepInfos analog,
            # reference TokenSet.cpp:603-619, Optimizer.hpp:69)
            best = eval_state["best"]
            overfit = (ce > eval_state["last"]
                       and abs(ce - best) > best / 10)
            if ce < best:
                eval_state["best"] = ce
                eval_state["no_improve"] = 0
            else:
                eval_state["no_improve"] += 1
            eval_state["last"] = ce
            flagmsg = " !OVERFIT!" if overfit else ""
            if eval_state["no_improve"] >= 3:
                flagmsg += f" (no improvement x{eval_state['no_improve']})"
            print(f"[eval {d.name}@{it}] ce={ce:.4f} ppl={ppl:.2f}{flagmsg}")
            new = not os.path.exists(eval_csv)
            with open(eval_csv, "a") as f:   # Eval.csv artifact (ref analog)
                if new:
                    f.write("iter,dataset,ce,ppl\n")
                f.write(f"{it},{d.name},{ce:.6f},{ppl:.4f}\n")
        return {}

    # in-training chat sample every gpt_every iters (Optimizer::Evaluate's
    # chat hook, reference Optimizer.cpp:717-749; config train.gpt-every)
    gpt_tok = None
    if tcard.gpt_every > 0 and p.hf_card:
        from koifish_tpu.data import BPETokenizer
        try:
            gpt_tok = BPETokenizer.from_file(p.hf_card)
        except Exception as e:
            print(f"[koifish] gpt-every disabled (no tokenizer): {e}")

    def gpt_sample(st, it):
        from koifish_tpu.config import SamplerCard
        from koifish_tpu.serve import generate, init_cache
        prompt_text = (p.prompts[0] if p.prompts else "Once upon a time")
        ids = gpt_tok.encode(prompt_text)[: card.n_ctx // 2] or [0]
        cache = init_cache(card.n_layer, 1, min(card.n_ctx, 256),
                           card.n_kv_head, card.head_dim)
        toks, _ = generate(card, st.params,
                           jax.numpy.asarray([ids], jax.numpy.int32), cache,
                           SamplerCard(temperature=0.0), max_new_tokens=24)
        print(f"[gpt@{it}] {prompt_text!r} -> "
              f"{gpt_tok.decode([int(t) for t in toks[0]])!r}")

    ckpt_dir = (p.checkpoint_out.path if p.checkpoint_out else args.out_dir)
    os.makedirs(ckpt_dir or ".", exist_ok=True)

    def save_fn(st, it, tag):
        path = os.path.join(ckpt_dir, f"koifish_{tag}_{it}.safetensors")
        save_train_state(path, st, card, extra_meta={"iter": it})
        print(f"[koifish] saved {tag} checkpoint -> {path}")

    # pipeline parallelism: staged-microbatch GPipe loop (its own driver —
    # params live as (stage_layers, other) pytrees on a pp mesh)
    if args.pp > 1:
        return _run_pipeline(args, p, card, tcard, state, batches,
                             total_steps)

    # multi-chip: shard state TP(+FSDP), batches DP (new capability vs the
    # single-GPU reference — SURVEY.md §2.7)
    sp_policy = None
    if args.dp * args.tp * args.sp > 1:
        from koifish_tpu.parallel.mesh import make_mesh
        from koifish_tpu.parallel.multihost import per_host_batch_slice
        from koifish_tpu.train.sharded import shard_batch, shard_train_state
        axes = {"dp": args.dp, "tp": args.tp}
        if args.sp > 1:
            axes["sp"] = args.sp
        mesh = make_mesh(axes)
        if args.sp > 1:
            # ring attention over the sp axis — an explicit trace-scoped
            # policy handed to make_train_step (ops/tracectx.py)
            from koifish_tpu.ops.tracectx import SPPolicy
            sp_policy = SPPolicy("sp", mesh)
        state = shard_train_state(state, mesh, tp="tp",
                                  fsdp="dp" if args.fsdp else None)
        if jax.process_count() > 1:
            # each host feeds only its slice of the global batch
            sl = per_host_batch_slice(tcard.batch)
            batches = (shard_batch(
                {k: v[:, sl] for k, v in b.items()}, mesh,
                global_batch=tcard.batch) for b in batches)
            print(f"[koifish] per-host batch rows {sl.start}:{sl.stop} "
                  f"of {tcard.batch}")
        else:
            batches = (shard_batch(b, mesh) for b in batches)
        print(f"[koifish] mesh dp={args.dp} tp={args.tp} sp={args.sp} "
              f"fsdp={args.fsdp}")

    qcard = p.quant if p.quant.rules else None
    if qcard is not None:
        mode = "gama" if qcard.train_target == "gama" else "fake-quant (STE)"
        print(f"[koifish] QAT enabled: {mode}, {len(qcard.rules)} rules")
        if qcard.train_target == "gama":
            from koifish_tpu.quant.apply import quantize_params
            state = init_train_state(
                card, tcard, params=quantize_params(state.params, qcard, card))

    hooks = []
    if gpt_tok is not None:
        def gpt_hook(st, it, loss):
            if it and it % tcard.gpt_every == 0:
                gpt_sample(st, it)
            return None
        hooks.append(gpt_hook)

    # Fuyou EOE swarm: rotate branches every `switch` iters (reference
    # ExploreOptimization hook, gLLM.cpp:673-677; config model.fuyou)
    if p.fuyou:
        import dataclasses as _dc
        from koifish_tpu.train.fuyou import Fuyou, FuyouConfig
        fcfg = FuyouConfig.from_json(p.fuyou)
        fy = Fuyou(fcfg, state.params)
        state = _dc.replace(state, params=fy.inject(state.params))
        fy_losses = []
        fy_rng = jax.random.PRNGKey(p.seed + 1)

        def fuyou_hook(st, it, loss, _fy=fy, _l=fy_losses):
            _l.append(loss)
            if (it + 1) % fcfg.switch:
                return None
            nonlocal fy_rng
            fy_rng, k = jax.random.split(fy_rng)
            recent = sum(_l[-fcfg.switch:]) / min(len(_l), fcfg.switch)
            new_params = _fy.rotate(st.params, recent, k)
            print(f"[fuyou] iter {it}: rotate -> branch {_fy.cur} "
                  f"(best={_fy.best}, score={recent:.4f})")
            return _dc.replace(st, params=new_params)
        hooks.append(fuyou_hook)

        print(f"[koifish] fuyou swarm: {fcfg.branches} branches, "
              f"switch={fcfg.switch}, method={fcfg.method}")

    hook_fn = None
    if hooks:
        def hook_fn(st, it, loss):
            for h in hooks:
                new = h(st, it, loss)
                if new is not None:
                    st = new
            return st

    wandb_run = None
    if args.wandb:
        try:
            import wandb
            wandb_run = wandb.init(project=args.wandb,
                                   config={"arch": card.arch,
                                           "batch": tcard.batch,
                                           "lr": tcard.lr})
        except Exception as e:
            print(f"[koifish] wandb unavailable: {e}")

    def log_fn(msg):
        print(msg)
        if wandb_run is not None and msg.startswith("["):
            try:
                parts = dict(kv.split("=") for kv in msg.split("]")[1].split()
                             if "=" in kv)
                wandb_run.log({k: float(v.rstrip("Ktok/s"))
                               for k, v in parts.items()
                               if k in ("loss", "lr", "gnorm")})
            except Exception:
                pass

    t0 = time.time()
    state, infos = train_loop(
        card, tcard, state, batches,
        total_steps=total_steps, log_fn=log_fn, eval_fn=eval_fn,
        save_fn=save_fn, qcard=qcard, trainable=trainable, hook_fn=hook_fn,
        sp=sp_policy)
    csv = tcard.train_csv_path or os.path.join(args.out_dir,
                                               "koifish_loss.csv")
    infos.save_csv(csv)
    if infos.rows:
        print(f"[koifish] done: {len(infos.rows)} iters in {time.time()-t0:.0f}s, "
              f"final loss {infos.losses[-1]:.4f}, curve -> {csv}")
    if tcard.save_every or p.checkpoint_out:
        save_fn(state, len(infos.rows), "final")
    return 0


def _run_pipeline(args, p, card, tcard, state, batches, total_steps) -> int:
    """Pipeline training loop (koifish --pp N), 1F1B or GPipe schedule."""
    import jax

    from koifish_tpu.parallel.mesh import make_mesh
    from koifish_tpu.parallel.pipeline import (make_pp_train_step,
                                               stack_for_pipeline)
    from koifish_tpu.train.optimizer import init_opt_state
    from koifish_tpu.train.trainer import StepInfo

    n_micro = args.n_micro or 2 * args.pp
    mesh = make_mesh({"pp": args.pp}, devices=jax.devices()[: args.pp])
    stage_layers, other = stack_for_pipeline(state.params, args.pp)
    opt = init_opt_state({"stages": stage_layers, "other": other},
                         tcard.optimizer, tcard.moment_dtype)
    step = make_pp_train_step(card, tcard, mesh, n_micro, total_steps,
                              schedule=getattr(args, "pp_schedule", "1f1b"))
    print(f"[koifish] pipeline: pp={args.pp} n_micro={n_micro} "
          f"schedule={getattr(args, 'pp_schedule', '1f1b')} "
          f"(bubble {(args.pp-1)/(n_micro+args.pp-1):.0%})")
    infos = StepInfo()
    ctx = (jax.sharding.use_mesh(mesh)
           if hasattr(jax.sharding, "use_mesh") else mesh)
    import time as _t
    with ctx:
        for it, batch in enumerate(batches):
            if 0 <= tcard.most_iter <= it or it >= total_steps:
                break
            tokens = batch["tokens"].reshape(-1, batch["tokens"].shape[-1])
            t0 = _t.perf_counter()
            stage_layers, other, opt, m = step(stage_layers, other, opt,
                                               tokens)
            loss = float(m["loss"])
            dt = _t.perf_counter() - t0
            infos.add(it, loss, float(m["lr"]), dt,
                      tokens.size / dt)
            if tcard.dump_every and it % tcard.dump_every == 0:
                print(f"[{it}] loss={loss:.4f} T={dt:.2f}s (pp)")
    csv = os.path.join(args.out_dir, "koifish_loss.csv")
    infos.save_csv(csv)
    if infos.rows:
        print(f"[koifish] pp done: {len(infos.rows)} iters, "
              f"final loss {infos.losses[-1]:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
