"""Streaming sharded quantize-at-load — the Qwen3-32B serving path.

The reference serves Qwen3-32B on one 24 GB 4090 by quantizing each
tensor AS IT STREAMS out of the safetensors mmap — ``LoadFolderOfST`` →
``Serial_Quant_MMAP`` (reference src/Manifold/Serialize.cpp:1018,
src/Device/CUDA/huTensor.cu:487; README.md:23): the full bf16 model
never exists anywhere. The TPU-native equivalent feeds a ``tp`` mesh
instead of one GPU:

    mmap view → canonical layout ([in, out]) → QuantCard rule →
    packed QTensor → ``jax.device_put`` with its TP PartitionSpec

one tensor at a time. Host RSS stays O(largest tensor); device HBM only
ever holds the quantized shards. At Qwen3-32B dims (E=5120, V=151936,
64 layers) that is the difference between a ~4.5 GB/chip INT4 load on a
TP=8 v5e mesh and a 64 GB bf16 materialization that fits nowhere.

Dense llama-family checkpoints only (Qwen2/Qwen3/LLaMA/Mistral — the
32B target); GPT2/MoE keep the load-then-quantize path
(``io/hf_loader.load_hf_model`` + ``quant/apply.quantize_params``),
whose results this module is parity-tested against.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from koifish_tpu.config import ModelCard, QuantCard
from koifish_tpu.quant.qtensor import QTensor

# column-chunk size for streamed quantization (tests shrink this to
# force multi-chunk coverage on tiny tensors)
CHUNK_BYTES = 128 << 20


def _lazy_folder(folder: str) -> Dict[str, np.ndarray]:
    """{name: zero-copy mmap view} over a HF dir (single file, index, or
    any *.safetensors). Nothing is read until a view is touched."""
    from koifish_tpu.io.safetensors import read_safetensors
    out: Dict[str, np.ndarray] = {}
    index = os.path.join(folder, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
    else:
        files = sorted(f for f in os.listdir(folder)
                       if f.endswith(".safetensors"))
    for fname in files:
        tensors, _ = read_safetensors(os.path.join(folder, fname), mmap=True)
        out.update(tensors)
    return out


def _quantize_one(w: jax.Array, rule) -> Any:
    """Apply one QuantCard rule to a [in, out] matrix (mirrors
    quant/apply.quantize_params's per-leaf dispatch)."""
    if rule is None or w.ndim != 2 or w.shape[0] % rule.group:
        return w
    if rule.method in ("CLUSTER", "KMEANS"):
        from koifish_tpu.quant.cluster import quantize_kmeans
        return quantize_kmeans(w, bits=rule.fmt.bits, group=rule.group)
    if rule.method in ("MINI", "MINI_GBDT"):
        from koifish_tpu.quant.cluster import quantize_mini
        return quantize_mini(w, bits=rule.fmt.bits, group=rule.group)
    if rule.method in ("SNQ", "SINKHORN"):
        from koifish_tpu.quant.cluster import quantize_sinkhorn
        return quantize_sinkhorn(w, rule.fmt, group=rule.group)
    from koifish_tpu.quant.rtn import quantize_jit
    return quantize_jit(w, rule.fmt, group=rule.group,
                        symmetric=rule.symmetric)


def load_hf_sharded_quantized(
    folder: str,
    mesh: Mesh,
    qcard: Optional[QuantCard] = None,
    card: Optional[ModelCard] = None,
    dtype=jnp.bfloat16,
    tp: str = "tp",
) -> tuple:
    """Returns (card, params) with every leaf already device_put onto
    ``mesh`` under its TP PartitionSpec, weights quantized per ``qcard``
    — without ever materializing more than one bf16 tensor at a time.

    The per-leaf pipeline (reference LoadFolderOfST order,
    Serialize.cpp:1018): mmap view → transpose to [in, out] → cast →
    quantize → shard. Embeddings quantize in head layout [E, V] like
    quantize_params does."""
    from koifish_tpu.parallel.sharding import (_fit_spec, _qtensor_specs,
                                               _spec_for_matrix)
    from koifish_tpu.quant.apply import param_path

    if card is None:
        with open(os.path.join(folder, "config.json")) as f:
            card = ModelCard.from_hf(json.load(f))
    if card.arch == "GPT2" or card.n_experts > 0:
        raise NotImplementedError(
            "streaming sharded load covers dense llama-family checkpoints "
            "(the 32B serving target); use load_hf_model + quantize_params "
            "+ shard_params for GPT2/MoE")
    raw = _lazy_folder(folder)

    def put(w, spec: P):
        return jax.device_put(
            w, NamedSharding(mesh, _fit_spec(w.shape, spec, mesh)))

    # RTN-family quantization streams in COLUMN chunks of the canonical
    # [in, out] matrix. HF stores [out, in] (and wte quantizes in head
    # layout [E, V] from the stored [V, E]), so in both cases a canonical
    # column chunk is a CONTIGUOUS ROW SLICE of the mmap — the peak host
    # footprint is one chunk's transients plus the accumulated int codes,
    # never a full bf16 tensor (measured at 32B embed dims: 6.7 GB
    # unchunked, the whole-model peak stays under the 1-tensor bound
    # chunked). Groups run along the in axis, so column chunking is
    # EXACT — identical codes/scales to whole-tensor quantization.
    chunk_bytes = CHUNK_BYTES
    _STREAMABLE = ("RTN", "RTNF", "NF", "F8EX", "F8E5M2", "F8E4M3")

    def _stream_quant(a: np.ndarray, rule):
        """a: HF-layout mmap view [out, in] (or [V, E] for wte). Returns
        a QTensor of the canonical [in, out] matrix."""
        rows, n_in = a.shape
        step = max(128, (chunk_bytes // max(n_in * a.dtype.itemsize, 1))
                   // 128 * 128)
        parts = []
        for s in range(0, rows, step):
            chunk = jnp.asarray(np.ascontiguousarray(a[s: s + step]))
            chunk = chunk.astype(dtype).T            # [in, <=step]
            parts.append(_quantize_one(chunk, rule))
        cat = lambda xs: (jnp.concatenate(xs, axis=1) if len(xs) > 1
                          else xs[0])
        return QTensor(
            codes=cat([p.codes for p in parts]),
            scales=cat([p.scales for p in parts]),
            zeros=(cat([p.zeros for p in parts])
                   if parts[0].zeros is not None else None),
            fmt=parts[0].fmt, shape=(n_in, rows), group=parts[0].group)

    def put_qtensor(name: str, q: QTensor) -> QTensor:
        specs = _qtensor_specs(name, q, tp, None)
        return QTensor(
            codes=put(q.codes, specs.codes),
            scales=put(q.scales, specs.scales),
            zeros=(put(q.zeros, specs.zeros)
                   if q.zeros is not None else None),
            fmt=q.fmt, shape=q.shape, group=q.group,
            # learned codebooks / Sinkhorn row factors replicate (tiny;
            # every shard's dispatch reads them)
            codebook=(put(q.codebook, P(*(None,) * q.codebook.ndim))
                      if q.codebook is not None else None),
            row_scale=(put(q.row_scale, P(None))
                       if q.row_scale is not None else None))

    def leaf(name: str, hf_name: str, li: Optional[int],
             transpose: bool = False, head_layout: bool = False):
        """One tensor through the whole pipeline. Frees host copies
        before returning (only the mmap view persists)."""
        a = raw[hf_name]
        rule = qcard.rule_for(param_path(li, name)) if qcard else None
        if (rule is not None and a.ndim == 2 and (transpose or head_layout)
                and a.shape[1] % rule.group == 0
                and rule.method in _STREAMABLE):
            return put_qtensor(name, _stream_quant(a, rule))
        w = jnp.asarray(np.ascontiguousarray(a.T if transpose else a))
        w = w.astype(dtype) if w.dtype != dtype else w
        if rule is not None and getattr(w, "ndim", 0) == 2:
            # non-streamable methods (codebook/Sinkhorn) quantize whole
            mat = w.T if head_layout else w
            q = _quantize_one(mat, rule)
            if isinstance(q, QTensor):
                return put_qtensor(name, q)
        if w.ndim == 2:
            spec = (P(None, None) if name in ("wpe", "router")
                    else _spec_for_matrix(name, tp, None))
        elif w.ndim == 1 and name in ("q_b", "k_b", "v_b"):
            spec = P(tp)
        else:
            spec = P(*(None,) * w.ndim)
        return put(w, spec)

    p: Dict[str, Any] = {
        "wte": leaf("wte", "model.embed_tokens.weight", None,
                    head_layout=True),
        "ln_f": leaf("ln_f", "model.norm.weight", None),
    }
    if not card.tie_embeddings:
        hf_head = ("lm_head.weight" if "lm_head.weight" in raw
                   else "model.embed_tokens.weight")
        p["head"] = leaf("head", hf_head, None, transpose=True)
    layers = []
    for i in range(card.n_layer):
        pre = f"model.layers.{i}."
        lp: Dict[str, Any] = {
            "ln1": leaf("ln1", pre + "input_layernorm.weight", i),
            "q": leaf("q", pre + "self_attn.q_proj.weight", i, True),
            "k": leaf("k", pre + "self_attn.k_proj.weight", i, True),
            "v": leaf("v", pre + "self_attn.v_proj.weight", i, True),
            "o": leaf("o", pre + "self_attn.o_proj.weight", i, True),
            "ln2": leaf("ln2", pre + "post_attention_layernorm.weight", i),
            "gate": leaf("gate", pre + "mlp.gate_proj.weight", i, True),
            "up": leaf("up", pre + "mlp.up_proj.weight", i, True),
            "down": leaf("down", pre + "mlp.down_proj.weight", i, True),
        }
        if card.qkv_bias:
            lp["q_b"] = leaf("q_b", pre + "self_attn.q_proj.bias", i)
            lp["k_b"] = leaf("k_b", pre + "self_attn.k_proj.bias", i)
            lp["v_b"] = leaf("v_b", pre + "self_attn.v_proj.bias", i)
        if card.qk_norm:
            lp["qn"] = leaf("qn", pre + "self_attn.q_norm.weight", i)
            lp["kn"] = leaf("kn", pre + "self_attn.k_norm.weight", i)
        layers.append(lp)
    p["layers"] = layers
    return card, p
