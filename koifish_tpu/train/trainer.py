"""Training driver — the analog of ``Optimizer::Search``
(reference: src/Manifold/Optimizer.cpp:580-680).

TPU-first restructuring: instead of the reference's per-tensor fused
update inside the backward sweep (``GTensor::Dogleg``), the whole
(loss → grad → clip → update) is ONE jitted, donated function; XLA owns
buffer reuse, which is what the reference's shared-grad-buffer trick
hand-implements. Gradient accumulation runs as a ``lax.scan`` over
micro-batches inside the same jit.

Keeps the reference's auxiliary behaviors (SURVEY.md §5.3):
- NaN/inf loss & grad detection with emergency checkpoint
- loss-validity asserts (0 < loss < 100, gLLM.cpp:780)
- spike-guard counters from the optimizer
- loss-curve recording to CSV (StepInfos analog, DataLoader.hpp:43-71)
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard, TrainCard
from koifish_tpu.models.transformer import model_forward
from koifish_tpu.ops.cross_entropy import cross_entropy_loss
from koifish_tpu.quant.qtensor import QTensor
from koifish_tpu.train.optimizer import OptState, apply_updates, init_opt_state
from koifish_tpu.train.schedule import lr_at


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt: OptState
    rng: jax.Array


def compute_loss(card: ModelCard, params, tokens, loss_mask=None,
                 remat: bool = False, qcard=None, rng=None,
                 fused_ce=None):
    """Next-token CE over [B, T] tokens (targets = tokens shifted).
    ``qcard`` with rules enables fake-quant QAT (STE) in the forward.
    SALMON (diffusion LM) uses the masked-reconstruction objective
    instead — ``rng`` drives the mask sampling.

    ``fused_ce``: None = auto (chunked logits-free classifier for
    vocab >= 64k); True/False force it (TrainCard.fused_ce — measured:
    fused wins at GPT2-774M, +1.2% and -1.6 GB of logits buffer; the
    bf16-logits path wins at 124M where that buffer is cheap memory
    but the chunk scan costs serialization)."""
    if qcard is not None and qcard.rules and qcard.train_target != "gama":
        from koifish_tpu.quant.qat import apply_qat
        params = apply_qat(params, qcard, card)
    if card.arch == "SALMON":
        from koifish_tpu.models.salmon import diffusion_loss
        key = rng if rng is not None else jax.random.PRNGKey(0)
        return diffusion_loss(card, params, tokens[:, :-1], key,
                              loss_mask=loss_mask[:, :-1]
                              if loss_mask is not None else None)
    targets = tokens[:, 1:]
    mask = loss_mask[:, 1:] if loss_mask is not None else None

    guppy_samps = None
    if card.arch == "GUPPY":
        # resample the vocab-memory FFN rows every step (the reference's
        # Guppy::BeforeNextStep / FFN::UpdateSamps(iter*nLayer+l))
        from koifish_tpu.models.guppy import sample_ids
        guppy_samps = sample_ids(
            card, rng if rng is not None else jax.random.PRNGKey(0))

    # large vocab: chunked fused classifier — never materialize [B,T,V]
    head = params.get("head", params["wte"])
    use_fused = fused_ce if fused_ce is not None else card.vocab_size >= 65536
    if use_fused and not isinstance(head, QTensor):
        from koifish_tpu.ops.cross_entropy import fused_ce_loss
        hidden = model_forward(card, params, tokens[:, :-1], remat=remat,
                               return_hidden=True, guppy_samps=guppy_samps)
        head_w = head if "head" in params else head.T
        return fused_ce_loss(hidden, head_w, targets, mask)

    logits = model_forward(card, params, tokens[:, :-1], remat=remat,
                           logits_dtype=jnp.bfloat16,
                           guppy_samps=guppy_samps)
    loss, per_tok = cross_entropy_loss(logits, targets, mask)
    return loss, per_tok


def _is_float(p):
    return jnp.issubdtype(p.dtype, jnp.floating)


def make_train_step(card: ModelCard, tcard: TrainCard, total_steps: int,
                    qcard=None, trainable=None,
                    compiler_options=None, sp=None) -> Callable:
    """Builds the jitted (state, batch) -> (state, metrics) step.

    qcard:     QuantCard → fake-quant QAT (or gama training when params
               already hold QTensors and train_target == "gama")
    trainable: same-structure tree of bool — frozen leaves get zero grads
               (SFT methods: lora/bitfit/only_attention/only_head)
    sp:        SPPolicy(axis, mesh) → sequence-parallel training (ring
               attention with T sharded over the axis)
    """
    from koifish_tpu.ops.tracectx import (Int8Policy, int8_scope, sp_scope)
    int8_pol = (Int8Policy(wgrad=tcard.int8_wgrad, dgrad=tcard.int8_dgrad,
                           min_weight_elems=tcard.int8_min_kn)
                if tcard.int8_matmul else None)
    if getattr(tcard, "kernel_choices", False):
        from koifish_tpu.utils import kernel_log
        kernel_log.set_verbose(True)

    def micro_grads(params, tokens, loss_mask, rng=None):
        # grad only w.r.t. float leaves — integer leaves (packed QTensor
        # codes under gama training) are frozen structure
        leaves, treedef = jax.tree_util.tree_flatten(params)
        flags = [_is_float(l) for l in leaves]
        diff = [l for l, f in zip(leaves, flags) if f]
        rest = [l for l, f in zip(leaves, flags) if not f]

        def merge(diff_leaves):
            it_d, it_r = iter(diff_leaves), iter(rest)
            full = [next(it_d) if f else next(it_r) for f in flags]
            return jax.tree_util.tree_unflatten(treedef, full)

        def loss_fn(diff_leaves):
            loss, _ = compute_loss(card, merge(diff_leaves), tokens,
                                   loss_mask, remat=tcard.remat, qcard=qcard,
                                   rng=rng,
                                   fused_ce=getattr(tcard, "fused_ce", None))
            return loss

        loss, g_diff = jax.value_and_grad(loss_fn)(diff)
        it_g = iter(g_diff)
        stub = [next(it_g) if f else jnp.zeros((0,), jnp.float32)
                for f in flags]
        return loss, jax.tree_util.tree_unflatten(treedef, stub)

    def _step_body(state: TrainState, batch: Dict[str, jax.Array]):
        tokens = batch["tokens"]            # [A, B, T+1] (A = accum)
        loss_mask = batch.get("loss_mask")  # [A, B, T+1] or None
        accum = tokens.shape[0]

        from koifish_tpu.train.optimizer import _real_grad

        def acc_add(a, b):
            if not _real_grad(b) or a.size == 0:
                return a
            return a + b.astype(jnp.float32)

        step_rng = jax.random.fold_in(state.rng, state.opt.step)

        def body(carry, xs):
            acc_g, acc_l = carry
            tok = xs["tokens"]
            msk = xs.get("loss_mask")
            loss, g = micro_grads(state.params, tok, msk,
                                  rng=jax.random.fold_in(step_rng,
                                                         xs["micro"]))
            acc_g = jax.tree_util.tree_map(acc_add, acc_g, g)
            return (acc_g, acc_l + loss), None

        if accum == 1:
            # no accumulation: skip the scan wrapper (a length-1 scan is a
            # fusion/donation barrier for XLA)
            loss_sum, grads = micro_grads(
                state.params, tokens[0],
                loss_mask[0] if loss_mask is not None else None,
                rng=step_rng)
        else:
            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape if _is_float(p) else (0,),
                                    jnp.float32), state.params)
            xs = {"tokens": tokens,
                  "micro": jnp.arange(accum, dtype=jnp.int32)}
            if loss_mask is not None:
                xs["loss_mask"] = loss_mask
            (grads, loss_sum), _ = jax.lax.scan(body, (zero_g, 0.0), xs)
        grads = jax.tree_util.tree_map(
            lambda g: g / accum if g.size else g, grads)
        if trainable is not None:
            # frozen leaves get empty-stub grads → the optimizer passes them
            # through untouched (zeroed grads would still apply weight decay)
            grads = jax.tree_util.tree_map(
                lambda g, t: g if t else jnp.zeros((0,), jnp.float32),
                grads, trainable)
        loss = loss_sum / accum

        lr = lr_at(state.opt.step, kind=tcard.scheduler, base_lr=tcard.lr,
                   total_steps=total_steps, warmup=tcard.warmup,
                   min_ratio=tcard.lr_min_ratio,
                   epoch_steps=tcard.epoch_iters)
        # stochastic rounding on bf16 storage (params + moments): derive
        # per-leaf streams from the step rng (0x5C0FF tags the SR use so
        # it can't collide with the micro-batch fold_in above)
        sr_cfg = getattr(tcard, "stochastic_round", "auto")
        if isinstance(sr_cfg, str):
            sr_on = sr_cfg.lower() in ("auto", "on", "true", "1")
        else:
            sr_on = bool(sr_cfg)   # False/0 off; True on
        sr_rng = (jax.random.fold_in(step_rng, 0x5C0FF) if sr_on else None)
        params, opt, metrics = apply_updates(
            state.params, grads, state.opt, optimizer=tcard.optimizer, lr=lr,
            beta1=tcard.beta1, beta2=tcard.beta2, eps=tcard.eps,
            weight_decay=tcard.weight_decay, muon_momentum=tcard.muon_momentum,
            grad_clip=tcard.grad_clip,
            lars_ratio=getattr(tcard, "lars_ratio", 0.0),
            muon_ortho=getattr(tcard, "muon_ortho", "ns"), sr_rng=sr_rng)
        metrics = dict(metrics, loss=loss, lr=lr)
        if tcard.check_tensor_norm:
            # per-leaf grad norms (DEBUG.check_tensor_norm / watch_Tensors
            # analog) — the host maps indices to leaf paths
            metrics["leaf_norms"] = jnp.stack([
                jnp.linalg.norm(g.astype(jnp.float32)) if g.size
                else jnp.float32(0.0)
                for g in jax.tree_util.tree_leaves(grads)])
        rng, _ = jax.random.split(state.rng)
        return TrainState(params=params, opt=opt, rng=rng), metrics

    @functools.partial(jax.jit, donate_argnames=("state",),
                       compiler_options=compiler_options)
    def step(state: TrainState, batch: Dict[str, jax.Array]):
        # policies live exactly as long as THIS trace: nothing ambient
        # survives the trace, so no reset/bleed across jit builders
        with int8_scope(int8_pol), sp_scope(sp):
            return _step_body(state, batch)

    return step


@dataclasses.dataclass
class StepInfo:
    """Loss-curve recorder → CSV (``StepInfos``, DataLoader.hpp:43-71)."""
    rows: list = dataclasses.field(default_factory=list)

    def add(self, it: int, loss: float, lr: float, dt: float, tps: float):
        self.rows.append((it, loss, lr, dt, tps))

    def save_csv(self, path: str):
        with open(path, "w") as f:
            f.write("iter,loss,lr,step_time,tokens_per_sec\n")
            for r in self.rows:
                f.write(",".join(f"{x:.6g}" for x in r) + "\n")

    @property
    def losses(self):
        return [r[1] for r in self.rows]


class TrainingInstability(RuntimeError):
    pass


def train_loop(
    card: ModelCard,
    tcard: TrainCard,
    state: TrainState,
    batches: Iterator[Dict[str, jax.Array]],
    total_steps: int,
    log_fn: Optional[Callable[[str], None]] = print,
    eval_fn: Optional[Callable[[TrainState, int], Dict[str, float]]] = None,
    save_fn: Optional[Callable[[TrainState, int, str], None]] = None,
    qcard=None,
    trainable=None,
    hook_fn: Optional[Callable[[TrainState, int, float], Optional[TrainState]]] = None,
    sp=None,
) -> Tuple[TrainState, StepInfo]:
    """Host loop around the jitted step — ``Optimizer::Search`` analog with
    the reference's instability handling (emergency checkpoint then abort,
    Optimizer.cpp:176-179). ``hook_fn(state, it, loss)`` runs after each
    step and may return a replacement state (Fuyou swarm rotation,
    gLLM.cpp:673-677)."""
    compiler_options = None
    if jax.device_count() > 1:
        # multi-chip: latency-hiding scheduler + collective matmul so
        # TP/FSDP collectives overlap compute (parallel/overlap.py)
        from koifish_tpu.parallel.overlap import overlap_compiler_options
        compiler_options = overlap_compiler_options()
    step = make_train_step(card, tcard, total_steps, qcard=qcard,
                           trainable=trainable,
                           compiler_options=compiler_options, sp=sp)
    infos = StepInfo()
    tokens_per_batch = None
    leaf_paths = None
    loop_t0 = time.perf_counter()
    for it, batch in enumerate(batches):
        if 0 <= tcard.most_iter <= it:
            break
        if it >= total_steps:
            break
        if tcard.time_most > 0 and \
                time.perf_counter() - loop_t0 > tcard.time_most:
            if log_fn:
                log_fn(f"[{it}] time budget {tcard.time_most}s exhausted "
                       f"(DEBUG.Time_most) — stopping")
            break
        if it == 0 and tcard.graph_dump:
            # DEBUG.graph_dump analog: the traced step's StableHLO is the
            # TGraph — write it out for inspection
            with open(tcard.graph_dump, "w") as f:
                f.write(step.lower(state, batch).as_text())
            if log_fn:
                log_fn(f"[0] step graph -> {tcard.graph_dump}")
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        if tokens_per_batch is None:
            tokens_per_batch = int(jnp.size(batch["tokens"]))
        tps = tokens_per_batch / dt
        infos.add(it, loss, float(metrics["lr"]), dt, tps)

        # instability detection (README "automatic detection of training
        # instability"; loss-validity assert gLLM.cpp:780)
        if not (0.0 < loss < 100.0) or not jnp.isfinite(
                jnp.asarray(metrics["grad_norm"])):
            if save_fn:
                save_fn(state, it, "emergency")
            raise TrainingInstability(
                f"iter {it}: loss={loss} grad_norm={float(metrics['grad_norm'])}")

        if log_fn and tcard.dump_every and it % tcard.dump_every == 0:
            from koifish_tpu.utils.mfu import step_mfu
            mfu = step_mfu(card, tokens_per_batch, dt)
            extra = f" mfu={mfu:.1%}" if mfu is not None else ""
            if "leaf_norms" in metrics:      # check_tensor_norm watch
                if leaf_paths is None:
                    from koifish_tpu.utils.dump import _path_str
                    leaf_paths = [
                        _path_str(pth) for pth, _ in
                        jax.tree_util.tree_flatten_with_path(state.params)[0]]
                norms = jnp.asarray(metrics["leaf_norms"])
                wi = int(jnp.argmax(norms))
                extra += f" worst_leaf={leaf_paths[wi]}:{float(norms[wi]):.3f}"
            log_fn(f"[{it}] loss={loss:.4f} lr={float(metrics['lr']):.2e} "
                   f"gnorm={float(metrics['grad_norm']):.3f} "
                   f"T={dt:.2f}s {tps/1e3:.1f}K tok/s" + extra)
        if hook_fn is not None:
            new_state = hook_fn(state, it, loss)
            if new_state is not None:
                state = new_state
        if eval_fn and tcard.eval_every and it and it % tcard.eval_every == 0:
            eval_fn(state, it)
        if save_fn and tcard.save_every and it and it % tcard.save_every == 0:
            save_fn(state, it, "periodic")
    return state, infos


def init_train_state(card: ModelCard, tcard: TrainCard,
                     key: Optional[jax.Array] = None,
                     params=None) -> TrainState:
    key = key if key is not None else jax.random.PRNGKey(tcard.seed)
    if params is None:
        from koifish_tpu.models import init_params
        params = init_params(card, key)
    return TrainState(params=params,
                      opt=init_opt_state(params, tcard.optimizer,
                                         tcard.moment_dtype),
                      rng=key)
