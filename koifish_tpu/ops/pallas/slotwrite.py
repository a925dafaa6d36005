"""Per-lane KV slot write — Pallas TPU kernel (scatter-free, block-local).

The non-uniform decode path (continuous batching: every lane sits at its
own position) writes one token's K/V into ``buf[b, :, slots[b], :]``.
The XLA choices are both bad on TPU:

- ``buf.at[arange(B), :, slots].set(val)`` lowers to a scatter that TPU
  executes as a serialized per-row loop (measured 33 ms/step, see
  kvcache.ring_write);
- the masked lane-select (``ring_write``) is fully vectorized but
  rewrites the ENTIRE buffer: at B=32 / S=1024 / D=128 INT8 that is
  2x33.5 MB of HBM traffic per K and V buffer per layer per token —
  ~1.9 GB/step over 28 layers, the same order as the attention reads.

This kernel touches one (SB=32)-row block per lane instead: grid over
B, block index ``slots[b] // SB`` via scalar prefetch, copy the block,
overwrite row ``slots[b] % SB``. Traffic drops to B x H x SB x D bytes
(1/32nd of the masked select at S=1024). The output aliases the input
buffer, so unvisited blocks are untouched memory, not copies — and if
XLA declines the alias the result is still correct (the copy it inserts
is a copy of the input).

Reference analog: the CUDA decode writes the KV slot in place
(Pipe.hpp:160 rolling kv_pos) — this is the TPU-native equivalent for
batches of independent positions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SB = 32          # S rows per block (int8 min sublane tile)

_INTERPRET = False


def set_interpret(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _platform_is_tpu() -> bool:
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(slots_ref, buf_ref, val_ref, o_ref, *, H):
    b = pl.program_id(0)
    row = slots_ref[b] % SB
    # The row update is a masked vector select over the (already
    # VMEM-resident) block, NOT a dynamic-index store: a dynamic sublane
    # store into an int8 (32,128)-tiled block fails Mosaic lowering
    # (HTTP 500 from the compile helper), and sub-word vector selects
    # have failed on chip before — widen to f32 (exact for int8/uint8/
    # bf16 payloads) and narrow on the way out.
    wide = (jnp.int32 if jnp.issubdtype(o_ref.dtype, jnp.integer)
            else jnp.float32)   # Mosaic has no uint8->f32 cast either
    for h in range(H):                       # H unrolled (small)
        blk = buf_ref[0, h].astype(wide)                 # [SB, Dc]
        v = val_ref[0, h].astype(wide)                   # [Dc]
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        o_ref[0, h] = jnp.where(rows == row, v[None, :],
                                blk).astype(o_ref.dtype)


def _slot_write_call(buf, val, slots):
    B, H, S, Dc = buf.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, SB, Dc),
                         lambda b, slots: (b, 0, slots[b] // SB, 0)),
            pl.BlockSpec((1, H, Dc), lambda b, slots: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, SB, Dc),
                               lambda b, slots: (b, 0, slots[b] // SB, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, H=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={1: 0},      # buf (after the scalar operand)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(slots, buf, val)


def _page_kernel(pids_ref, rows_ref, pages_ref, val_ref, o_ref, *, H):
    b = pl.program_id(0)
    row = rows_ref[b]
    wide = (jnp.int32 if jnp.issubdtype(o_ref.dtype, jnp.integer)
            else jnp.float32)
    for h in range(H):
        blk = pages_ref[h, 0].astype(wide)               # [PAGE, D]
        v = val_ref[0, h].astype(wide)                   # [D]
        rr = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        o_ref[h, 0] = jnp.where(rr == row, v[None, :],
                                blk).astype(o_ref.dtype)


def page_write_or_none(pages: jax.Array, val: jax.Array,
                       page_ids: jax.Array, rows: jax.Array):
    """Paged-pool variant (serve/paged.py): pages [H, NP, P, D] <- val
    [B, H, D] at (page_ids[b], rows[b]). Same block-local masked-select
    pattern as slot_write; one page DMA'd per lane.

    CONTRACT: ``page_ids`` must be distinct across lanes (each lane owns
    its pages — PageAllocator guarantees it). Two lanes addressing the
    same page would race the per-program block writeback."""
    if pages.ndim != 4 or not _platform_is_tpu():
        return None
    H, NP, P, D = pages.shape
    if P % 8 != 0 or D % 64 != 0 or H > 16:
        return None
    if pages.dtype not in (jnp.int8, jnp.uint8, jnp.bfloat16, jnp.float32):
        return None
    B = val.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((H, 1, P, D),
                         lambda b, pids, rows: (0, pids[b], 0, 0)),
            pl.BlockSpec((1, H, D), lambda b, pids, rows: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((H, 1, P, D),
                               lambda b, pids, rows: (0, pids[b], 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_page_kernel, H=H),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        input_output_aliases={2: 0},     # pages (after the two scalars)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(page_ids.astype(jnp.int32), rows.astype(jnp.int32), pages,
      val.astype(pages.dtype))


def slot_write_or_none(buf: jax.Array, val: jax.Array, slots: jax.Array):
    """buf [B, H, S, Dc] <- val [B, H, Dc] at per-lane rows slots [B].
    Returns the updated buffer, or None when the kernel is ineligible
    (caller falls back to the masked select)."""
    if buf.ndim != 4 or not _platform_is_tpu():
        return None
    B, H, S, Dc = buf.shape
    if S % SB != 0 or Dc % 64 != 0 or H > 16:
        return None
    if buf.dtype not in (jnp.int8, jnp.uint8, jnp.bfloat16, jnp.float32):
        return None
    return _slot_write_call(buf, val.astype(buf.dtype),
                            slots.astype(jnp.int32))
