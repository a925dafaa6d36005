"""Pipeline parallelism — GPipe-style microbatch schedule over a ``pp``
mesh axis.

New capability vs the reference (which has no multi-device execution at
all, SURVEY.md §2.7 PP row). TPU-native shape: the L layers are stacked
and sharded over the ``pp`` axis ([P, L/P, ...] with axis 0 on ``pp``);
a ``shard_map`` program runs M + P - 1 lockstep ticks, each tick
applying a stage's L/P layers (inner ``lax.scan``) and handing the
activation to the next stage with ``lax.ppermute``. Bubble fraction =
(P-1)/(M+P-1), the classic GPipe overhead — raise ``n_micro`` to
amortize.

Embeddings/final-norm/head are replicated (small next to the layer
stack); stage 0 embeds, the last stage computes norm+head(+CE).
Backward differentiates through the same program (``ppermute`` is
linear, so ``jax.grad`` derives the reverse hand-offs); 1F1B memory
scheduling is future work — this is the staged-microbatch scaffold.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

if hasattr(jax, "shard_map"):
    shard_map = jax.shard_map
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from koifish_tpu.config import ModelCard
from koifish_tpu.models.transformer import (_norm, gather_embed,
                                            layer_forward, lm_head)
from koifish_tpu.ops.rope import rope_freqs


def stack_for_pipeline(params: Dict[str, Any], n_stages: int):
    """params['layers'] (list of L dicts) → stacked [P, L/P, ...] leaves.
    Returns (stage_layers, other_params)."""
    from koifish_tpu.serve.stacked import stack_layers
    L = len(params["layers"])
    assert L % n_stages == 0, f"n_layer {L} % pp {n_stages} != 0"
    stacked = stack_layers(params)
    if stacked is None:
        raise ValueError("heterogeneous layers can't be pipeline-stacked")
    per = L // n_stages
    stage_layers = jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, per, *x.shape[1:]), stacked["layers"])
    other = {k: v for k, v in params.items() if k != "layers"}
    return stage_layers, other


def _stage_apply(card: ModelCard, layers_p, x, cos, sin, positions):
    def body(h, lp):
        return layer_forward(card, lp, h, cos, sin, positions), None
    out, _ = jax.lax.scan(body, x, layers_p)
    return out


def _pipeline(card: ModelCard, stage_layers, other, toks_m, tgt_m, msk_m,
              mesh: Mesh, axis: str, with_loss: bool):
    n_micro, mb, T = toks_m.shape
    Pn = mesh.shape[axis]
    positions = jnp.arange(T, dtype=jnp.int32)
    cos = sin = None
    if card.pos_embed == "rope":
        cos, sin = rope_freqs(card.head_dim, card.max_pos, card.rope_theta,
                              card.rope_scaling_dict())
    fwd_perm = [(i, i + 1) for i in range(Pn - 1)]

    def per_device(layers_p, other_r, toks, tgts, msks):
        layers_p = jax.tree_util.tree_map(lambda x: x[0], layers_p)
        p = jax.lax.axis_index(axis)
        M, E = n_micro, card.n_embd
        ticks = M + Pn - 1

        def embed(i):
            x = gather_embed(other_r["wte"], toks[i])
            if card.pos_embed == "learned":
                x = x + jnp.take(other_r["wpe"], positions, axis=0)
            return x.astype(jnp.bfloat16)

        def tick(t, carry):
            recv, acc_loss, outs = carry
            mb_idx = t - p
            active = jnp.logical_and(mb_idx >= 0, mb_idx < M)
            x_in = jnp.where(p == 0, embed(jnp.clip(t, 0, M - 1)), recv)
            y = _stage_apply(card, layers_p, x_in, cos, sin, positions)
            y = jnp.where(active, y, jnp.zeros_like(y))
            i = jnp.clip(mb_idx, 0, M - 1)
            take = jnp.logical_and(active, p == Pn - 1)
            h = _norm(card, y, other_r["ln_f"], other_r.get("ln_f_b"))
            logits = lm_head(card, other_r, h, out_dtype=jnp.bfloat16)
            if with_loss:
                from koifish_tpu.ops.cross_entropy import cross_entropy_loss
                loss, _ = cross_entropy_loss(logits, tgts[i], msks[i])
                acc_loss = acc_loss + jnp.where(take, loss, 0.0)
            else:
                outs = outs.at[i].set(
                    jnp.where(take, logits, outs[i]))
            recv = jax.lax.ppermute(y, axis, fwd_perm)
            return recv, acc_loss, outs

        recv0 = jnp.zeros((mb, T, E), jnp.bfloat16)
        outs0 = jnp.zeros((M, mb, T, 1 if with_loss else card.vocab_size),
                          jnp.bfloat16)
        loss0 = jnp.zeros((), jnp.float32)
        if hasattr(jax.lax, "pvary"):
            # mark the initial carry as device-varying over the pp axis
            # (the loop body makes it so via axis_index/ppermute, and
            # shard_map's VMA check requires carry in/out types to match)
            recv0, loss0, outs0 = jax.lax.pvary((recv0, loss0, outs0), axis)
        _, acc_loss, outs = jax.lax.fori_loop(
            0, ticks, tick, (recv0, loss0, outs0))
        # loss lives on the last stage only; psum shares it
        return jax.lax.psum(acc_loss, axis) / M, outs[None]

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stage_layers),
        jax.tree_util.tree_map(lambda _: P(), other),
        P(), P(), P(),
    )
    out_specs = (P(), P(axis))
    f = shard_map(per_device, mesh=mesh, in_specs=in_specs,
                  out_specs=out_specs)
    return f(stage_layers, other, toks_m, tgt_m, msk_m)


def pipeline_logits(card: ModelCard, stage_layers, other, tokens: jax.Array,
                    mesh: Mesh, n_micro: int, axis: str = "pp") -> jax.Array:
    """tokens [B, T] → logits [B, T, V] through the pipeline."""
    B, T = tokens.shape
    assert B % n_micro == 0
    toks_m = tokens.reshape(n_micro, B // n_micro, T)
    dummy_t = jnp.zeros_like(toks_m)
    dummy_m = jnp.ones(toks_m.shape, bool)
    _, outs = _pipeline(card, stage_layers, other, toks_m, dummy_t, dummy_m,
                        mesh, axis, with_loss=False)
    # outs: [P, M, mb, T, V]; the last stage's buffer holds the logits
    return outs[-1].reshape(B, T, -1)


def make_pp_train_step(card: ModelCard, tcard, mesh: Mesh, n_micro: int,
                       total_steps: int, axis: str = "pp"):
    """Jitted (stage_layers, other, opt_state, tokens) -> (..., metrics)
    pipeline training step reusing the AdamW/Muon pipe on the staged
    param pytrees."""
    from koifish_tpu.ops.tracectx import Int8Policy, int8_scope
    from koifish_tpu.train.optimizer import apply_updates
    from koifish_tpu.train.schedule import lr_at

    # int8 policy scoped to THIS step's trace (a leaked ambient switch
    # used to change the scan carry dtypes across builders)
    int8_pol = (Int8Policy(wgrad=tcard.int8_wgrad,
                           min_weight_elems=tcard.int8_min_kn)
                if getattr(tcard, "int8_matmul", False) else None)

    @functools.partial(jax.jit, donate_argnames=("stage_layers", "other",
                                                 "opt"))
    def step(stage_layers, other, opt, tokens, loss_mask=None):
        with int8_scope(int8_pol):
            return _step_body(stage_layers, other, opt, tokens, loss_mask)

    def _step_body(stage_layers, other, opt, tokens, loss_mask=None):
        params = {"stages": stage_layers, "other": other}

        def loss_fn(params):
            return pipeline_loss(card, params["stages"], params["other"],
                                 tokens, mesh, n_micro, axis=axis,
                                 loss_mask=loss_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        lr = lr_at(opt.step, kind=tcard.scheduler, base_lr=tcard.lr,
                   total_steps=total_steps, warmup=tcard.warmup,
                   min_ratio=tcard.lr_min_ratio)
        params, opt, metrics = apply_updates(
            params, grads, opt, optimizer=tcard.optimizer, lr=lr,
            beta1=tcard.beta1, beta2=tcard.beta2, eps=tcard.eps,
            weight_decay=tcard.weight_decay, grad_clip=tcard.grad_clip)
        metrics = dict(metrics, loss=loss, lr=lr)
        return params["stages"], params["other"], opt, metrics

    return step


def pipeline_loss(card: ModelCard, stage_layers, other, tokens: jax.Array,
                  mesh: Mesh, n_micro: int, axis: str = "pp",
                  loss_mask: Optional[jax.Array] = None) -> jax.Array:
    """Next-token CE over [B, T+1] tokens through the pipeline (mean over
    microbatches) — differentiable w.r.t. (stage_layers, other)."""
    B = tokens.shape[0]
    assert B % n_micro == 0
    mb = B // n_micro
    inp = tokens[:, :-1].reshape(n_micro, mb, -1)
    tgt = tokens[:, 1:].reshape(n_micro, mb, -1)
    msk = (loss_mask[:, 1:].reshape(n_micro, mb, -1)
           if loss_mask is not None else jnp.ones(tgt.shape, bool))
    loss, _ = _pipeline(card, stage_layers, other, inp, tgt, msk,
                        mesh, axis, with_loss=True)
    return loss
