"""Hyperparameter sweep harness — the analog of the reference's
cases/SweepHyParams.py regression driver: run `koifish` over a parameter
grid (injected into the config like the reference injects most_iter,
SweepHyParams.py:134-150), collect final losses to sweep.csv.

Usage:
  python cases/sweep.py base_config.json --param train.learning-rate \
      --values 3e-4 6e-4 1e-3 --most-iter 50 [--device cpu]
"""
import argparse
import copy
import csv
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def set_path(cfg, dotted, value):
    keys = dotted.split(".")
    cur = cfg
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--param", required=True, help="dotted config path")
    ap.add_argument("--values", nargs="+", required=True, type=float)
    ap.add_argument("--most-iter", type=int, default=50)
    ap.add_argument("--device", default=None)
    ap.add_argument("--out", default="sweep.csv")
    args = ap.parse_args()

    base = json.load(open(args.config))
    rows = []
    for v in args.values:
        cfg = copy.deepcopy(base)
        set_path(cfg, args.param, v)
        set_path(cfg, "debug.most_iter", args.most_iter)
        with tempfile.TemporaryDirectory() as td:
            cfgp = os.path.join(td, "cfg.json")
            json.dump(cfg, open(cfgp, "w"))
            cmd = [sys.executable, "-m", "koifish_tpu.cli.koifish", cfgp,
                   "--out-dir", td]
            if args.device:
                cmd += ["--device", args.device]
            r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            final = float("nan")
            losscsv = os.path.join(td, "koifish_loss.csv")
            if r.returncode == 0 and os.path.exists(losscsv):
                with open(losscsv) as f:
                    final = float(list(csv.DictReader(f))[-1]["loss"])
            print(f"{args.param}={v}: final loss {final:.4f} "
                  f"(rc={r.returncode})")
            rows.append((v, final, r.returncode))
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([args.param, "final_loss", "returncode"])
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
