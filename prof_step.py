"""Profile a GPT2 train step on the attached chip: on-device op breakdown.

Usage: python prof_step.py [--model 124m|774m|1558m] [--batch N] [--int8]
       [--remat off|dots|full] [--opt adamw|muon] [--mdt f32|bf16]
       [--sr auto|off] [--dgrad off|fold|tile] [--fce] [--wgrad]
"""
import glob, gzip, json, collections, sys, time
import jax, jax.numpy as jnp

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.train.trainer import init_train_state, make_train_step

_DIMS = {
    "124m": dict(n_layer=12, n_embd=768, n_head=12, n_ffn=3072),
    "774m": dict(n_layer=36, n_embd=1280, n_head=20, n_ffn=5120),
    "1558m": dict(n_layer=48, n_embd=1600, n_head=25, n_ffn=6400),
}


def _arg(flag, default):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default


model = _arg("--model", "124m")
d = _DIMS[model]
card = ModelCard.from_arch(
    "GPT2", vocab_size=50304, n_kv_head=d["n_head"], head_dim=64,
    n_ctx=1024, max_pos=1024, **d)
B = int(_arg("--batch", {"124m": 16, "774m": 8, "1558m": 8}[model]))
int8 = "--int8" in sys.argv
remat = {"off": False, "dots": "dots", "full": True}[_arg("--remat", "off")]
tcard = TrainCard(batch=B, lr=6e-4, warmup=10,
                  stochastic_round=(_arg("--sr", "auto") != "off"),
                  optimizer=_arg("--opt", "adamw"),
                  moment_dtype=_arg("--mdt", "f32"), remat=remat,
                  int8_matmul=int8, int8_min_kn=4 << 20,
                  int8_wgrad="--wgrad" in sys.argv,
                  int8_dgrad={"off": False, "fold": True, "tile": "tile"}[
                      _arg("--dgrad", "off")],
                  fused_ce=True if "--fce" in sys.argv else None)
step = make_train_step(card, tcard, total_steps=1000)
state = init_train_state(card, tcard)
key = jax.random.PRNGKey(0)
tokens = jax.random.randint(key, (1, B, 1025), 0, card.vocab_size, jnp.int32)
batch = {"tokens": tokens}

for _ in range(3):
    state, metrics = step(state, batch)
float(metrics["loss"])

t0 = time.perf_counter()
for _ in range(8):
    state, metrics = step(state, batch)
float(metrics["loss"])
wall = (time.perf_counter() - t0) / 8
print(f"wall: {wall*1e3:.1f} ms/step  {B*1024/wall/1e3:.1f}K tok/s")

outdir = f"/tmp/prof_train_{model}{'_int8' if int8 else ''}"
jax.profiler.start_trace(outdir)
for _ in range(3):
    state, metrics = step(state, batch)
float(metrics["loss"])
jax.profiler.stop_trace()

path = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    t = json.load(f)
ev = [e for e in t["traceEvents"] if e.get("ph") == "X"]
# aggregate by the short op NAME (long_name starts with '%', which the
# old split-on-'%' collapsed into one empty bucket); show the long name
# under the top entries for shape/operand context
agg = collections.Counter()
counts = collections.Counter()
long_names = {}
for e in ev:
    name = e["name"]
    if name.startswith(("$", "Pjit", "jit_", "np.", "Device", "Parse",
                        "Python", "PJRT")):
        continue
    # collapse per-layer clones (fusion.117, flash_bwd_call.36, ...) into
    # one row per op FAMILY: 36 layers of the same kernel read as one
    # line with a call count instead of flooding the top-40
    fam = name[:90].rstrip("0123456789").rstrip(".")
    agg[fam] += e.get("dur", 0)
    counts[fam] += 1
    args = e.get("args") or {}
    if args.get("long_name"):
        long_names[fam] = args["long_name"][:160]
jit_total = sum(e.get("dur", 0) for e in ev if e["name"].startswith("jit_"))
print(f"device jit total: {jit_total/3e3:.1f} ms/step over 3 steps")
for name, dur in agg.most_common(40):
    print(f"{dur/3e3:9.3f} ms  x{counts[name]//3:<4d} {name}")
    if name in long_names:
        print(f"             {long_names[name]}")
