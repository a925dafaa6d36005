"""Profile the real GPT2-124M train step: on-device op breakdown."""
import glob, gzip, json, collections, sys, time
import jax, jax.numpy as jnp

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.train.trainer import init_train_state, make_train_step

card = ModelCard.from_arch(
    "GPT2", vocab_size=50304, n_layer=12, n_embd=768, n_head=12,
    n_kv_head=12, head_dim=64, n_ffn=3072, n_ctx=1024, max_pos=1024)
B = 16
int8 = "--int8" in sys.argv
tcard = TrainCard(batch=B, lr=6e-4, warmup=10, optimizer="adamw", remat=False,
                  int8_matmul=int8, int8_wgrad="--wgrad" in sys.argv)
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

outdir = f"/tmp/prof_train{'_int8' if int8 else ''}"
jax.profiler.start_trace(outdir)
for _ in range(3):
    state, metrics = step(state, batch)
float(metrics["loss"])
jax.profiler.stop_trace()

path = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    t = json.load(f)
ev = [e for e in t["traceEvents"] if e.get("ph") == "X"]
# device events: pid of TPU tracks; keep ones with 'dur' and exclude python host frames
agg = collections.Counter()
total = 0
for e in ev:
    name = e["name"]
    if name.startswith("$") or "(" in name and name.startswith(("Pjit", "jit_")):
        continue
    args = e.get("args") or {}
    lbl = args.get("long_name") or name
    agg[lbl.split("%")[0][:140]] += e.get("dur", 0)
jit_total = sum(e.get("dur", 0) for e in ev if e["name"].startswith("jit_"))
print(f"device jit total: {jit_total/3e3:.1f} ms/step over 3 steps")
for name, dur in agg.most_common(40):
    print(f"{dur/3e3:9.3f} ms  {name}")
