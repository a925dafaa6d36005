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
stack); stage 0 embeds, the last stage computes norm+head(+CE) — under
``lax.cond`` so only ONE device per tick pays the [mb*T, E] x [E, V]
head GEMM (round-2 ran it on every stage every tick).

Two schedules:
- ``gpipe``: backward derived by ``jax.grad`` of the lockstep loop
  (``ppermute`` is linear) — all M microbatch activations live at once;
- ``1f1b``: hand-staged one-forward-one-backward — each tick every
  stage runs one forward and one ``jax.vjp`` backward (for an earlier
  microbatch), stashing only the stage INPUT in a ring of 2P slots and
  recomputing the stage interior at backward time (per-stage remat).
  Live activation memory is O(P·mb·T·E), independent of M — the memory
  win that is the point of pipeline parallelism.
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


def _pv(x, axis):
    """Mark as device-varying over ``axis`` (VMA) — cond/scan carries
    must type-match across branches/iterations."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    if hasattr(jax.lax, "pvary"):  # pragma: no cover - older jax
        return jax.lax.pvary(x, axis)
    return x  # pragma: no cover - no VMA checking


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
        # promote the replicated operands to device-varying HERE, at the
        # top of the per-device program: an implicit pvary inside a
        # lax.cond branch transposes to a psum executed by only the
        # devices taking that branch — a guaranteed collective deadlock.
        # One explicit top-level pvary transposes to one uniform psum.
        other_r = _pv(other_r, axis)
        toks, tgts, msks = _pv((toks, tgts, msks), axis)
        p = jax.lax.axis_index(axis)
        M, E = n_micro, card.n_embd
        ticks = M + Pn - 1

        def embed(i):
            x = gather_embed(other_r["wte"], toks[i])
            if card.pos_embed == "learned":
                x = x + jnp.take(other_r["wpe"], positions, axis=0)
            return x.astype(jnp.bfloat16)

        def _head(y_):
            h = _norm(card, y_, other_r["ln_f"], other_r.get("ln_f_b"))
            return lm_head(card, other_r, h, out_dtype=jnp.bfloat16)

        def tick(t, carry):
            recv, acc_loss, outs = carry
            mb_idx = t - p
            active = jnp.logical_and(mb_idx >= 0, mb_idx < M)
            x_in = jnp.where(p == 0, embed(jnp.clip(t, 0, M - 1)), recv)
            y = _stage_apply(card, layers_p, x_in, cos, sin, positions)
            y = jnp.where(active, y, jnp.zeros_like(y))
            i = jnp.clip(mb_idx, 0, M - 1)
            take = jnp.logical_and(active, p == Pn - 1)
            # norm+head(+CE) ONLY on the last stage's active ticks —
            # every other (stage, tick) skips the [mb*T,E]x[E,V] GEMM
            # entirely (lax.cond executes one branch at runtime)
            if with_loss:
                from koifish_tpu.ops.cross_entropy import cross_entropy_loss

                def _head_loss(y_, i_):
                    loss, _ = cross_entropy_loss(_head(y_), tgts[i_],
                                                 msks[i_])
                    return loss

                acc_loss = acc_loss + jax.lax.cond(
                    take, _head_loss,
                    lambda y_, i_: _pv(jnp.float32(0.0), axis), y, i)
            else:
                logits = jax.lax.cond(
                    take, _head,
                    lambda y_: _pv(jnp.zeros((mb, T, card.vocab_size),
                                             jnp.bfloat16), axis), y)
                outs = outs.at[i].set(jnp.where(take, logits, outs[i]))
            recv = jax.lax.ppermute(y, axis, fwd_perm)
            return recv, acc_loss, outs

        recv0 = jnp.zeros((mb, T, E), jnp.bfloat16)
        # loss mode carries no logits buffer at all (round 2 kept a dead
        # [M, mb, T, 1] one); logits mode needs the full [M, mb, T, V]
        outs0 = jnp.zeros((0,) if with_loss else
                          (M, mb, T, card.vocab_size), jnp.bfloat16)
        loss0 = jnp.zeros((), jnp.float32)
        # mark the initial carry as device-varying over the pp axis
        # (the loop body makes it so via axis_index/ppermute, and
        # shard_map's VMA check requires carry in/out types to match)
        recv0, loss0, outs0 = _pv((recv0, loss0, outs0), axis)
        _, acc_loss, outs = jax.lax.fori_loop(
            0, ticks, tick, (recv0, loss0, outs0))
        if with_loss:
            # loss lives on the last stage only; psum shares it
            return jax.lax.psum(acc_loss, axis) / M
        return outs[None]

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stage_layers),
        jax.tree_util.tree_map(lambda _: P(), other),
        P(), P(), P(),
    )
    out_specs = P() if with_loss else P(axis)
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
    outs = _pipeline(card, stage_layers, other, toks_m, dummy_t, dummy_m,
                     mesh, axis, with_loss=False)
    # outs: [P, M, mb, T, V]; the last stage's buffer holds the logits
    return outs[-1].reshape(B, T, -1)


def make_pp_train_step(card: ModelCard, tcard, mesh: Mesh, n_micro: int,
                       total_steps: int, axis: str = "pp",
                       schedule: str = "1f1b"):
    """Jitted (stage_layers, other, opt_state, tokens) -> (..., metrics)
    pipeline training step reusing the AdamW/Muon pipe on the staged
    param pytrees. ``schedule``: "1f1b" (default — O(P) activation
    memory) or "gpipe" (AD over the lockstep loop, O(M) memory)."""
    assert schedule in ("1f1b", "gpipe"), schedule
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

        if schedule == "1f1b":
            loss, grads = pipeline_loss_and_grads_1f1b(
                card, stage_layers, other, tokens, mesh, n_micro,
                axis=axis, loss_mask=loss_mask)
        else:
            def loss_fn(params):
                return pipeline_loss(card, params["stages"],
                                     params["other"], tokens, mesh,
                                     n_micro, axis=axis,
                                     loss_mask=loss_mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
        lr = lr_at(opt.step, kind=tcard.scheduler, base_lr=tcard.lr,
                   total_steps=total_steps, warmup=tcard.warmup,
                   min_ratio=tcard.lr_min_ratio,
                   epoch_steps=getattr(tcard, "epoch_iters", 0))
        params, opt, metrics = apply_updates(
            params, grads, opt, optimizer=tcard.optimizer, lr=lr,
            beta1=tcard.beta1, beta2=tcard.beta2, eps=tcard.eps,
            weight_decay=tcard.weight_decay, grad_clip=tcard.grad_clip)
        metrics = dict(metrics, loss=loss, lr=lr)
        return params["stages"], params["other"], opt, metrics

    return step


def _pipeline_1f1b(card: ModelCard, stage_layers, other, toks_m, tgt_m,
                   msk_m, mesh: Mesh, axis: str):
    """One-forward-one-backward schedule: returns (loss, stage_grads,
    other_grads) without ``jax.grad`` over the whole loop.

    Timetable (stage p, microbatch i, P stages, M microbatches):
      forward  F_p(i) at tick  p + i
      backward B_p(i) at tick  2(P-1) - p + i   (last stage: same tick
                                                 as its forward)
    Each tick every stage runs at most one F and one B — the classic
    1F1B steady state. A stage stashes only its INPUT activation in a
    ring of 2P slots (occupancy ≤ 2(P-1-p)+1 ≤ 2P-1) and recomputes its
    interior at backward time via ``jax.vjp`` (per-stage remat), so live
    activation memory is O(P·mb·T·E) — independent of M, unlike the
    gpipe schedule where AD keeps all M microbatches alive.
    """
    from koifish_tpu.ops.cross_entropy import cross_entropy_loss

    n_micro, mb, T = toks_m.shape
    Pn = mesh.shape[axis]
    positions = jnp.arange(T, dtype=jnp.int32)
    cos = sin = None
    if card.pos_embed == "rope":
        cos, sin = rope_freqs(card.head_dim, card.max_pos, card.rope_theta,
                              card.rope_scaling_dict())
    fwd_perm = [(i, i + 1) for i in range(Pn - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, Pn)]

    def per_device(layers_p, other_r, toks, tgts, msks):
        layers_p = jax.tree_util.tree_map(lambda x: x[0], layers_p)
        # top-level varying promotion — see the note in _pipeline: an
        # implicit pvary inside a cond branch transposes to a
        # branch-local psum (collective deadlock). Promoting here keeps
        # stage_fn's vjp free of collectives, which also lets bwd_sub
        # run under cond(b_active) (stages diverge at warmup/cooldown).
        other_r = _pv(other_r, axis)
        toks, tgts, msks = _pv((toks, tgts, msks), axis)
        p = jax.lax.axis_index(axis)
        M, E = n_micro, card.n_embd
        S = 2 * Pn
        ticks = M + 2 * (Pn - 1)
        is_first = p == 0
        is_last = p == Pn - 1

        def embed(o_r, i):
            x = gather_embed(o_r["wte"], toks[i])
            if card.pos_embed == "learned":
                x = x + jnp.take(o_r["wpe"], positions, axis=0)
            return x.astype(jnp.bfloat16)

        def stage_fn(lp, o_r, x_act, i):
            """The whole per-stage computation for microbatch ``i``:
            stage 0 embeds (x_act ignored), the last stage adds
            norm+head+CE (under cond — one head GEMM per microbatch
            total across the mesh). Differentiable in (lp, o_r, x_act)."""
            # x_act is already varying — do NOT pvary it here (a pvary
            # of a differentiated value inside a cond branch transposes
            # to a branch-local psum: deadlock)
            x = jax.lax.cond(is_first, lambda: embed(o_r, i),
                             lambda: x_act)
            y = _stage_apply(card, lp, x, cos, sin, positions)

            def _loss():
                h = _norm(card, y, o_r["ln_f"], o_r.get("ln_f_b"))
                logits = lm_head(card, o_r, h, out_dtype=jnp.bfloat16)
                loss, _ = cross_entropy_loss(logits, tgts[i], msks[i])
                return loss

            loss = jax.lax.cond(is_last, _loss,
                                lambda: _pv(jnp.float32(0.0), axis))
            return y, loss

        def fwd_sub(x_act, i):
            """Forward-only: the last stage's forward output is never
            consumed (its backward recomputes from the stash), so skip
            its layer stack at runtime."""
            return jax.lax.cond(
                is_last, lambda: _pv(jnp.zeros((mb, T, E), jnp.bfloat16),
                                     axis),
                lambda: stage_fn(layers_p, other_r, x_act, i)[0])

        zero_gl = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), layers_p)
        zero_go = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), other_r)

        def bwd_sub(x_j, j, g_y, gl, go):
            (y_j, loss_j), pull = jax.vjp(
                lambda lp, o_r, xa: stage_fn(lp, o_r, xa, j),
                layers_p, other_r, x_j)
            dy = jnp.where(is_last, jnp.zeros_like(g_y), g_y)
            dloss = jnp.where(is_last, jnp.float32(1.0), jnp.float32(0.0))
            dl, do, dx = pull((dy.astype(y_j.dtype),
                               dloss.astype(loss_j.dtype)))
            gl = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), gl, dl)
            go = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), go, do)
            return gl, go, dx.astype(jnp.bfloat16), loss_j

        def tick(t, carry):
            recv_f, recv_b, stash, gl, go, acc_loss = carry

            # ---- forward sub-step: F_p(i_f) at t == p + i_f
            i_f = t - p
            f_active = jnp.logical_and(i_f >= 0, i_f < M)
            i_fc = jnp.clip(i_f, 0, M - 1)
            slot_f = i_fc % S
            # guard: inactive ticks must NOT clobber a live slot (i_fc
            # clamps to 0 / M-1 whose stashes may still await backward)
            stash = stash.at[slot_f].set(
                jnp.where(f_active, recv_f, stash[slot_f]))
            y = fwd_sub(recv_f, i_fc)
            y = jnp.where(f_active, y, jnp.zeros_like(y))
            recv_f = jax.lax.ppermute(y, axis, fwd_perm)

            # ---- backward sub-step: B_p(i_b) at t == 2(P-1) - p + i_b
            i_b = t - 2 * (Pn - 1) + p
            b_active = jnp.logical_and(i_b >= 0, i_b < M)
            i_bc = jnp.clip(i_b, 0, M - 1)
            x_j = stash[i_bc % S]

            def do_bwd(gl, go, acc_loss):
                gl2, go2, dx, loss_j = bwd_sub(x_j, i_bc, recv_b, gl, go)
                acc2 = acc_loss + jnp.where(is_last, loss_j, 0.0)
                return gl2, go2, dx, acc2

            def skip_bwd(gl, go, acc_loss):
                return gl, go, _pv(jnp.zeros((mb, T, E), jnp.bfloat16),
                                   axis), acc_loss

            gl, go, dx, acc_loss = jax.lax.cond(
                b_active, do_bwd, skip_bwd, gl, go, acc_loss)
            recv_b = jax.lax.ppermute(dx, axis, bwd_perm)
            return recv_f, recv_b, stash, gl, go, acc_loss

        carry0 = _pv((jnp.zeros((mb, T, E), jnp.bfloat16),
                      jnp.zeros((mb, T, E), jnp.bfloat16),
                      jnp.zeros((S, mb, T, E), jnp.bfloat16),
                      zero_gl, zero_go, jnp.zeros((), jnp.float32)), axis)
        _, _, _, gl, go, acc_loss = jax.lax.fori_loop(0, ticks, tick, carry0)

        loss = jax.lax.psum(acc_loss, axis) / M
        # per-microbatch mean: cotangent seeded at 1.0 above, scale here
        gl = jax.tree_util.tree_map(lambda g: (g / M)[None], gl)
        # replicated params: stage 0 contributed embed grads, the last
        # stage head/ln_f grads — psum merges them
        go = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis) / M, go)
        return loss, gl, go

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stage_layers),
        jax.tree_util.tree_map(lambda _: P(), other),
        P(), P(), P(),
    )
    out_specs = (P(),
                 jax.tree_util.tree_map(lambda _: P(axis), stage_layers),
                 jax.tree_util.tree_map(lambda _: P(), other))
    f = shard_map(per_device, mesh=mesh, in_specs=in_specs,
                  out_specs=out_specs)
    return f(stage_layers, other, toks_m, tgt_m, msk_m)


def pipeline_loss_and_grads_1f1b(
        card: ModelCard, stage_layers, other, tokens: jax.Array, mesh: Mesh,
        n_micro: int, axis: str = "pp",
        loss_mask: Optional[jax.Array] = None):
    """(loss, grads) via the hand-staged 1F1B schedule — grads match
    ``jax.grad(pipeline_loss)`` (same math, different staging), with the
    stage-layer grads cast back to param dtype."""
    B = tokens.shape[0]
    assert B % n_micro == 0
    mb = B // n_micro
    inp = tokens[:, :-1].reshape(n_micro, mb, -1)
    tgt = tokens[:, 1:].reshape(n_micro, mb, -1)
    msk = (loss_mask[:, 1:].reshape(n_micro, mb, -1)
           if loss_mask is not None else jnp.ones(tgt.shape, bool))
    loss, gl, go = _pipeline_1f1b(card, stage_layers, other, inp, tgt, msk,
                                  mesh, axis)
    gl = jax.tree_util.tree_map(lambda g, pp: g.astype(pp.dtype),
                                gl, stage_layers)
    go = jax.tree_util.tree_map(lambda g, pp: g.astype(pp.dtype),
                                go, other)
    return loss, {"stages": gl, "other": go}


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
    return _pipeline(card, stage_layers, other, inp, tgt, msk,
                     mesh, axis, with_loss=True)
