"""Big-model training sweep — the VERDICT-r2 #2 experiment matrix.

Targets the GPT2-774M/1558M gap (0.31x/0.28x vs the reference's F8
numbers, BASELINE.md). One command on the real chip:

    python tools/sweep_big.py [--model 774m|1558m|both] [--quick]

Grid per model:
- remat: off / "dots" / full  (x batch sizes that fit)
- int8 matmuls with the K*N gate LOWERED so the dense layers qualify
  (774M: 1280x5120 = 6.5M < default 2^24 gate; measured r2 on 124M the
  dense layers lost — the hypothesis is they WIN at >=1280-wide dims
  where the dot is long enough to amortize the quant pass)
- int8 fused-CE chunk dots (landed r2, never measured on chip)

Prints one line per config: tok/s, step time, MFU, loss@last (sanity),
then a ranked summary. Writes results to tools/sweep_big_results.json.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def run_one(model: str, batch: int, remat, int8: bool, int8_min_kn: int,
            steps: int = 8, optimizer: str = "adamw",
            moment_dtype: str = "f32", dgrad: bool = False) -> dict:
    """One config in a FRESH subprocess (isolates OOM/compile failures)."""
    code = f"""
import time
import jax, jax.numpy as jnp
from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.train.trainer import init_train_state, make_train_step
from koifish_tpu.utils.mfu import step_mfu

MODELS = {{
  "774m": dict(vocab_size=50304, n_layer=36, n_embd=1280, n_head=20,
               n_kv_head=20, head_dim=64, n_ffn=5120, n_ctx=1024,
               max_pos=1024),
  "1558m": dict(vocab_size=50304, n_layer=48, n_embd=1600, n_head=25,
                n_kv_head=25, head_dim=64, n_ffn=6400, n_ctx=1024,
                max_pos=1024),
}}
card = ModelCard.from_arch("GPT2", **MODELS["{model}"])
tcard = TrainCard(batch={batch}, lr=6e-4, warmup=10, optimizer="{optimizer}",
                  moment_dtype="{moment_dtype}",
                  remat={remat!r}, int8_matmul={int8}, int8_dgrad={dgrad},
                  int8_min_kn={int8_min_kn})
step = make_train_step(card, tcard, total_steps=1000)
state = init_train_state(card, tcard)
tokens = jax.random.randint(jax.random.PRNGKey(0), (1, {batch}, 1025), 0,
                            card.vocab_size, dtype=jnp.int32)
batch = {{"tokens": tokens}}
for _ in range(3):
    state, m = step(state, batch)
l0 = float(m["loss"])
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range({steps}):
        state, m = step(state, batch)
    loss = float(m["loss"])
    best = min(best, (time.perf_counter() - t0) / {steps})
# quality gate, not a print (VERDICT r4 weak #3): random-token loss must
# stay finite, below ln(V)+slack, and not climb from the warmup value —
# a quantization-noise regression in the int8 recipe trips this
assert loss == loss and 0.0 < loss < 11.5, f"loss diverged: {{loss}}"
assert loss <= l0 + 0.05, f"loss climbed {{l0}} -> {{loss}}"
tps = {batch} * 1024 / best
mfu = step_mfu(card, {batch} * 1024, best)
print("RESULT " + __import__("json").dumps(dict(
    tok_s=round(tps, 1), step_s=round(best, 3),
    mfu=round(mfu, 4) if mfu else None, loss=round(loss, 3),
    loss0=round(l0, 3))))
"""
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True, timeout=1500,
                           cwd="/root/repo")
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for line in reversed(p.stdout.splitlines()):
        if line.startswith("RESULT "):
            out = json.loads(line[7:])
            out["wall_s"] = round(time.time() - t0, 1)
            return out
    return {"error": (p.stderr or "no output").strip()[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="both", choices=["774m", "1558m", "both"])
    ap.add_argument("--quick", action="store_true",
                    help="only the most promising configs")
    args = ap.parse_args()
    models = ["774m", "1558m"] if args.model == "both" else [args.model]

    # Sweep-2 results (bf16 moments + muon): 774m best 24.7K (B=16
    # no-remat int8 bf16-mdt, mfu .62); 1558m best 10.36K (B=8 FULL remat
    # int8 bf16-mdt, mfu .52 — int8 fwd also cheapens the remat
    # recompute) then 9.96K (B=4 dots bf16-mdt). Muon loses: NS iterations
    # cost ~15% and f32 momentum forces full remat at 1558m.
    # Sweep 3: int8 dgrad (scale-folded dy) + batch fills around the two
    # winners.
    grids = {
        "774m": [
            dict(batch=16, remat=False, int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16", dgrad=True),
            dict(batch=24, remat=False, int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16"),
            dict(batch=24, remat=False, int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16", dgrad=True),
        ],
        "1558m": [
            dict(batch=8, remat=True, int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16", dgrad=True),
            dict(batch=16, remat=True, int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16"),
            dict(batch=16, remat=True, int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16", dgrad=True),
            dict(batch=4, remat="dots", int8=True, int8_min_kn=4 << 20,
                 moment_dtype="bf16", dgrad=True),
        ],
    }
    if args.quick:
        grids = {m: g[:4] for m, g in grids.items()}

    results = []
    for model in models:
        for cfg in grids[model]:
            tag = (f"{model} B={cfg['batch']} remat={cfg['remat']} "
                   f"int8={cfg['int8']}"
                   + (f"@kn>={cfg['int8_min_kn']>>20}M" if cfg["int8"] else "")
                   + (" +dgrad" if cfg.get("dgrad") else "")
                   + f" opt={cfg.get('optimizer', 'adamw')}"
                   + f" mdt={cfg.get('moment_dtype', 'f32')}")
            print(f"[sweep] {tag} ...", flush=True)
            r = run_one(model, **cfg)
            r["tag"] = tag
            results.append(r)
            print(f"[sweep]   -> {json.dumps(r)}", flush=True)

    ok = [r for r in results if "tok_s" in r]
    ok.sort(key=lambda r: -r["tok_s"])
    print("\n=== ranked ===")
    for r in ok:
        print(f"{r['tok_s']:>10.1f} tok/s  mfu={r.get('mfu')}  {r['tag']}")
    with open("/root/repo/tools/sweep_big_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
