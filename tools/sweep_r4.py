"""Round-4 on-chip sweep: Pallas fused-CE configs at GPT2-124M (headline)
and GPT2-774M. One process — TPU init and compile cache amortized.

Usage: python tools/sweep_r4.py [124m|774m|both]
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.train.trainer import init_train_state, make_train_step

_DIMS = {
    "124m": dict(n_layer=12, n_embd=768, n_head=12, n_ffn=3072),
    "774m": dict(n_layer=36, n_embd=1280, n_head=20, n_ffn=5120),
    "1558m": dict(n_layer=48, n_embd=1600, n_head=25, n_ffn=6400),
}


def run(model, B, fce, int8, remat=False, mdt="bf16", reps=8, dgrad=False):
    d = _DIMS[model]
    card = ModelCard.from_arch("GPT2", vocab_size=50304,
                               n_kv_head=d["n_head"], head_dim=64,
                               n_ctx=1024, max_pos=1024, **d)
    tcard = TrainCard(batch=B, lr=6e-4, warmup=10, optimizer="adamw",
                      moment_dtype=mdt, remat=remat, int8_matmul=int8,
                      int8_min_kn=4 << 20, fused_ce=fce, int8_dgrad=dgrad)
    label = (f"{model} B={B} fce={fce} int8={int8} remat={remat}"
             f" dgrad={dgrad}")
    try:
        step = make_train_step(card, tcard, total_steps=1000)
        state = init_train_state(card, tcard)
        tokens = jax.random.randint(jax.random.PRNGKey(0),
                                    (1, B, 1025), 0, card.vocab_size,
                                    jnp.int32)
        batch = {"tokens": tokens}
        for _ in range(3):
            state, m = step(state, batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = step(state, batch)
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        print(f"{label}: {B*1024/dt/1e3:.1f}K tok/s  ({dt*1e3:.1f} ms) "
              f"loss={loss:.3f}", flush=True)
        del state
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("124m", "both"):
    run("124m", 32, None, False)          # r3 headline config (bf16 logits)
    run("124m", 32, True, False)          # Pallas bf16 fused CE
    run("124m", 32, True, True)           # Pallas int8 fused CE + int8 head
    run("124m", 48, True, True)
    run("124m", 64, True, True)
if which in ("774m", "both"):
    run("774m", 16, True, True)           # r4 current best (645 ms)
    run("774m", 24, True, True)
    run("774m", 24, True, True, remat="dots")
    run("774m", 32, True, True, remat="dots")
if which == "dgrad":
    run("774m", 16, True, True, dgrad=False)
    run("774m", 16, True, True, dgrad="tile")
    run("1558m", 16, True, True, remat=True, reps=4, dgrad="tile")
if which in ("1558m", "both"):
    run("1558m", 16, True, True, remat=True, reps=4)   # r3 best config + Pallas CE
    run("1558m", 16, True, True, remat="dots", reps=4)
