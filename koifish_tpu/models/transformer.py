"""Generic decoder-only transformer — pure-functional JAX.

Covers the reference's dense model zoo (GPT2 / Qwen2.5 / Qwen3 / LLaMA /
Mistral / Bitnet) through ModelCard flags, the way the reference's
``NLP_AutoRegressive`` subclasses set arch quirks in their ctors
(reference: src/Manifold/gLLM.hpp:60-369, Transformer/QWen.cpp:27-50 —
e.g. QWEN3: no QKV bias, per-head QK-norm, separate Q/K/V).

Param pytree layout (per layer, python list — heterogeneous per-layer
quant formats allowed, matching the reference's per-layer quantizer
ablation, cases/test_lite.py:67-84)::

    params = {
      "wte": [V, E] array | QTensor[E, V] (head layout when quantized),
      "wpe": [maxpos, E]                  (GPT2 learned positions),
      "layers": [ { "ln1", ("ln1_b"), "q","k","v","o", ("q_b","k_b","v_b","o_b"),
                    ("qn","kn"),  # Qwen3 per-head QK-RMSNorm
                    "ln2", ("ln2_b"),
                    "gate","up","down"  |  "fc","fc_b","proj","proj_b" }, ... ],
      "ln_f", ("ln_f_b"),
      ("head": [E, V])                    (untied lm head),
    }

Any weight-matrix leaf may be a QTensor; ops/matmul dispatches.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from koifish_tpu.config import ModelCard
from koifish_tpu.ops.attention import causal_attention
from koifish_tpu.ops.matmul import linear, qmatmul
from koifish_tpu.ops.norms import layernorm, rmsnorm
from koifish_tpu.ops.rope import apply_rope, rope_freqs
from koifish_tpu.quant.qtensor import QTensor
from koifish_tpu.quant.packing import unpack_codes

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_params(card: ModelCard, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """GPT2-style init: normal(0.02), residual-out projections scaled by
    1/sqrt(2L) (the reference inherits llm.c's init for GPT2 pretraining)."""
    E, Hq, Hkv, D, F, L = (card.n_embd, card.n_head, card.n_kv_head,
                           card.head_dim, card.n_ffn, card.n_layer)
    std = 0.02
    res_std = std / math.sqrt(2 * L)
    keys = jax.random.split(key, L + 3)

    def nrm(k, shape, s=std):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    params: Params = {
        "wte": nrm(keys[0], (card.vocab_size, E)),
        "ln_f": jnp.ones((E,), dtype),
    }
    if card.pos_embed == "learned":
        params["wpe"] = nrm(keys[1], (card.max_pos, E))
    if card.norm == "layernorm":
        params["ln_f_b"] = jnp.zeros((E,), dtype)
    if not card.tie_embeddings:
        params["head"] = nrm(keys[2], (E, card.vocab_size))

    if card.arch == "LLAMA_VAE":
        # token embedding factored through the EmbedVAE latent stack
        # (reference LLAMA_VAE, gLLM.hpp:163-182; latent_dim default 192)
        from koifish_tpu.models.embed_vae import init_embed_vae
        dims = [E] + list(card.token_embeds or (192,))
        # fresh key: keys[2] already seeds the untied head
        params["evae"] = init_embed_vae(jax.random.fold_in(keys[2], 7),
                                        dims, dtype=dtype)

    layers: List[Params] = []
    for li in range(L):
        ks = jax.random.split(keys[3 + li], 8)
        if card.arch == "MAMBA":
            from koifish_tpu.models.mamba import init_mamba_layer
            lp: Params = {"ln1": jnp.ones((E,), dtype)}
            lp.update(init_mamba_layer(card, ks[0], dtype))
            layers.append(lp)
            continue
        if li in card.gau_layers:
            # GAU block replaces the whole (attention, FFN) pair
            from koifish_tpu.models.gau import init_gau_layer
            lp = {"ln1": jnp.ones((E,), dtype)}
            lp.update(init_gau_layer(card, ks[0], dtype))
            layers.append(lp)
            continue
        elif li in card.brown_layers:
            # BROWN replaces the attention; the FFN neuron stays
            from koifish_tpu.models.brown import init_brown_layer
            lp = {"ln1": jnp.ones((E,), dtype),
                  "ln2": jnp.ones((E,), dtype)}
            lp.update(init_brown_layer(card, ks[0], dtype))
        elif card.attn == "mla":
            from koifish_tpu.models.mla import init_mla_layer
            lp = {"ln1": jnp.ones((E,), dtype),
                  "ln2": jnp.ones((E,), dtype)}
            lp.update(init_mla_layer(card, ks[0], dtype))
        else:
            lp = {
                "ln1": jnp.ones((E,), dtype),
                "q": nrm(ks[0], (E, Hq * D)),
                "k": nrm(ks[1], (E, Hkv * D)),
                "v": nrm(ks[2], (E, Hkv * D)),
                "o": nrm(ks[3], (Hq * D, E), res_std),
                "ln2": jnp.ones((E,), dtype),
            }
        if card.norm == "layernorm":
            lp["ln1_b"] = jnp.zeros((E,), dtype)
            lp["ln2_b"] = jnp.zeros((E,), dtype)
        if card.qkv_bias and "brown_w" not in lp:
            lp["q_b"] = jnp.zeros((Hq * D,), dtype)
            lp["k_b"] = jnp.zeros((Hkv * D,), dtype)
            lp["v_b"] = jnp.zeros((Hkv * D,), dtype)
        if card.qk_norm and "brown_w" not in lp:
            lp["qn"] = jnp.ones((D,), dtype)
            lp["kn"] = jnp.ones((D,), dtype)
        if card.n_experts > 0 and (not card.moe_layers
                                   or li in card.moe_layers):
            # all layers MoE, or only the hybrid backbone's chosen layers
            from koifish_tpu.models.moe import init_moe_layer
            lp.update(init_moe_layer(card, ks[4], dtype))
        elif card.arch == "GUPPY":
            # vocab-memory FFN: weights are sampled wte rows (injected at
            # forward time, models/guppy.py); only a gain is learned here
            lp["guppy_gain"] = jnp.ones((), dtype)
        elif card.act == "swiglu":
            lp["gate"] = nrm(ks[4], (E, F))
            lp["up"] = nrm(ks[5], (E, F))
            lp["down"] = nrm(ks[6], (F, E), res_std)
        else:  # gelu MLP (GPT2)
            lp["fc"] = nrm(ks[4], (E, F))
            lp["fc_b"] = jnp.zeros((F,), dtype)
            lp["proj"] = nrm(ks[5], (F, E), res_std)
            lp["proj_b"] = jnp.zeros((E,), dtype)
        if card.norm == "layernorm" and card.act != "swiglu":
            lp["o_b"] = jnp.zeros((E,), dtype)
        layers.append(lp)
    params["layers"] = layers
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def gather_embed(wte, tokens: jax.Array) -> jax.Array:
    """Token-embedding lookup. Plain [V,E] row gather; quantized embeddings
    are stored in head layout [E, V] and dequantized per-column — the TPU
    analog of the reference's dequant-row embed kernels
    (CU_embed_forw_q4/nf4, src/Device/CUDA/kernel/embed.cuh:55-123)."""
    if isinstance(wte, QTensor):
        ids = tokens.reshape(-1)
        cols = jnp.take(wte.codes, ids, axis=1)           # [E_packed, N]
        raw = unpack_codes(cols, wte.fmt, wte.shape[0], group=wte.group)
        from koifish_tpu.quant.qtensor import codebook_for
        from koifish_tpu.dtypes import QFormat
        if wte.fmt is QFormat.INT8:
            vals = raw.astype(jnp.float32)
        elif wte.fmt.is_codebook:
            vals = codebook_for(wte.fmt)[raw.astype(jnp.int32)]
        else:
            vals = raw.astype(jnp.float32) - float(1 << (wte.fmt.bits - 1))
        s = jnp.take(wte.scales, ids, axis=1).astype(jnp.float32)  # [E/g, N]
        g = wte.group
        vals = vals.reshape(-1, g, vals.shape[-1]) * s[:, None, :]
        emb = vals.reshape(wte.shape[0], -1).T            # [N, E]
        return emb.reshape(*tokens.shape, -1).astype(jnp.bfloat16)
    return jnp.take(wte, tokens, axis=0)


def embed_tokens(card: ModelCard, params: Params, tokens: jax.Array
                 ) -> jax.Array:
    """Token embedding incl. the LLAMA_VAE latent factorization — the
    single entry point shared by training forward and the serve paths."""
    x = gather_embed(params["wte"], tokens)
    if "evae" in params:
        from koifish_tpu.models.embed_vae import decode, encode
        x = decode(params["evae"], encode(params["evae"], x))
    return x


def _norm(card: ModelCard, x, w, b=None, residual=None):
    if card.norm == "rmsnorm":
        return rmsnorm(x, w, eps=card.norm_eps, residual=residual)
    return layernorm(x, w, b, eps=card.norm_eps, residual=residual)


def _linear_l(x: jax.Array, lp: Params, key: str) -> jax.Array:
    """Linear through ``lp[key]`` + optional LoRA adapter ``lp[key+"_lora"]``
    (HIERARCH_LorAB forward rhs=b(a·x), reference Neuron.hpp:60-86)."""
    y = linear(x, lp[key], lp.get(key + "_b"))
    lora = lp.get(key + "_lora")
    if lora is not None:
        y = y + (x @ lora["a"].astype(x.dtype)) @ lora["b"].astype(x.dtype)
    return y


def qkv_project(card: ModelCard, lp: Params, x: jax.Array,
                cos, sin, positions) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x -> rotated q,k and v, shaped [B, T, H, D]."""
    if card.attn == "mla":
        from koifish_tpu.models.mla import mla_qkv
        return mla_qkv(card, lp, x, positions)
    B, T, _ = x.shape
    D = card.head_dim
    # NB: runtime-fused QKV (concat weights, one wide matmul) was measured
    # 3% SLOWER on v5e — the per-step concat of weight inputs isn't free and
    # XLA already schedules the three dots back-to-back. Kept separate.
    q = _linear_l(x, lp, "q").reshape(B, T, card.n_head, D)
    k = _linear_l(x, lp, "k").reshape(B, T, card.n_kv_head, D)
    v = _linear_l(x, lp, "v").reshape(B, T, card.n_kv_head, D)
    if card.qk_norm:  # per-head RMSNorm before RoPE (Qwen3)
        q = rmsnorm(q, lp["qn"], eps=card.norm_eps)
        k = rmsnorm(k, lp["kn"], eps=card.norm_eps)
    if card.pos_embed == "rope":
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
    return q, k, v


def mlp(card: ModelCard, lp: Params, x: jax.Array) -> jax.Array:
    if "router" in lp:
        from koifish_tpu.models.moe import moe_ffn
        return moe_ffn(card, lp, x)
    if "guppy_gain" in lp:
        from koifish_tpu.models.guppy import guppy_ffn
        return guppy_ffn(lp, x)
    if card.act == "swiglu":
        g = _linear_l(x, lp, "gate")
        u = _linear_l(x, lp, "up")
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        return _linear_l(h, lp, "down")
    h = _linear_l(x, lp, "fc")
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return _linear_l(h, lp, "proj")


def layer_forward(card: ModelCard, lp: Params, x: jax.Array,
                  cos, sin, positions, window: int = 0) -> jax.Array:
    """One transformer block over a full sequence (training / prefill)."""
    if card.arch == "MAMBA":
        from koifish_tpu.models.mamba import mamba_block
        h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
        return x + mamba_block(card, lp, h)
    if "upU" in lp:     # GAU block (models/gau.py) — no separate FFN
        from koifish_tpu.models.gau import gau_block
        return gau_block(card, lp, x, cos, sin, positions)
    if "brown_w" in lp:  # BROWN learned attention (models/brown.py) + FFN
        from koifish_tpu.models.brown import brown_attn
        x = brown_attn(card, lp, x, cos, sin, positions)
        h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
        return x + mlp(card, lp, h)
    h = _norm(card, x, lp["ln1"], lp.get("ln1_b"))
    q, k, v = qkv_project(card, lp, h, cos, sin, positions)
    a = causal_attention(q, k, v, window=window, causal=card.causal)
    B, T = x.shape[:2]
    a = _linear_l(a.reshape(B, T, -1), lp, "o")
    x = x + a
    h = _norm(card, x, lp["ln2"], lp.get("ln2_b"))
    return x + mlp(card, lp, h)


def lm_head(card: ModelCard, params: Params, x: jax.Array,
            out_dtype=jnp.float32) -> jax.Array:
    """Hidden states -> logits (tied or untied head). Training uses bf16
    logits (halves the [B,T,V] HBM traffic; CE math still upcasts)."""
    if not card.tie_embeddings:
        return qmatmul(x, params["head"], out_dtype=out_dtype)
    wte = params["wte"]
    if isinstance(wte, QTensor):            # head layout [E, V]
        return qmatmul(x, wte, out_dtype=out_dtype)
    # tied head routes through qmatmul so int8-training GEMMs (the FP8
    # head GEMM analog) cover the largest dot in the step; the wte.T
    # transpose folds into the quantize reductions / dot, never
    # materialized.
    return qmatmul(x, wte.T, out_dtype=out_dtype)


def model_forward(
    card: ModelCard,
    params: Params,
    tokens: jax.Array,                      # [B, T] int32
    positions: Optional[jax.Array] = None,  # [B, T] or [T]
    window: int = 0,
    return_hidden: bool = False,
    remat: bool = False,
    logits_dtype=jnp.float32,
    guppy_samps: Optional[jax.Array] = None,   # [L, F] ids (GUPPY arch)
) -> jax.Array:
    """Full-sequence forward: tokens -> logits [B, T, V] (f32).

    The analog of the reference's training forward sweep
    (``Fish::ForwardOnRLS``, src/Manifold/gLLM.cpp:722) — but expressed as
    one traced function; XLA owns scheduling/fusion instead of the
    reference's per-TaskNode dispatch.
    """
    B, T = tokens.shape
    if positions is None:
        positions = jnp.arange(T, dtype=jnp.int32)
    window = window or card.window
    if card.arch == "GUPPY" and "guppy_rows" not in params["layers"][0]:
        from koifish_tpu.models.guppy import inject_rows
        params = inject_rows(card, params, guppy_samps)
    x = embed_tokens(card, params, tokens)
    if card.pos_embed == "learned":
        x = x + jnp.take(params["wpe"], positions, axis=0)
    cos = sin = None
    if card.pos_embed == "rope":
        cos, sin = rope_freqs(card.head_dim, card.max_pos, card.rope_theta,
                              card.rope_scaling_dict())
    block = layer_forward
    if remat:
        # activation rematerialization — replaces the reference's RLS
        # residency planner + remater_ffn machinery (Scheduler.cpp:361,
        # QKV.cu:770-783) with jax.checkpoint. remat="dots" keeps every
        # GEMM output resident and recomputes only the cheap elementwise
        # chain (norms, rope, activations) — the remat FLOP tax drops
        # from ~33% of the step to ~0 while most of the activation
        # memory (the FFN/QKV intermediates dominate) is still freed.
        policy = None
        if remat == "dots":
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        block = jax.checkpoint(
            functools.partial(layer_forward, window=window),
            static_argnums=(0,), policy=policy)
    for lp in params["layers"]:
        if remat:
            x = block(card, lp, x, cos, sin, positions)
        else:
            x = block(card, lp, x, cos, sin, positions, window=window)
    x = _norm(card, x, params["ln_f"], params.get("ln_f_b"))
    if return_hidden:
        return x
    return lm_head(card, params, x, out_dtype=logits_dtype)
