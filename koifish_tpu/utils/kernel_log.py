"""Kernel-dispatch observability — the DUMP kernel-choice analog.

The reference surfaces which CUDA kernel variant each op picked through
its DUMP switches (reference src/CLI_params.hpp:720-785, e.g.
``verInferQKV``/``T_GEMM`` selectors are *printed* at dispatch). Here
every fused Pallas path has an XLA fallback that engages SILENTLY when
an eligibility gate fails (odd batch, unsupported head size, wrong
group size) — a config drifting off the fused path can lose 2x
throughput with no signal.

This module makes dispatch observable:

- ``fallback(kernel, reason)``: a fused path was skipped — logged ONCE
  per (kernel, reason) to stderr. Default ON when running on real TPU
  hardware (where the loss is real); suppressed on CPU backends (where
  everything legitimately falls back and tests would drown in noise).
  ``KOIFISH_DUMP_KERNELS=0`` silences, ``=2`` forces on everywhere.
- ``choice(kernel, desc)``: a fused path WAS taken — only in verbose
  mode (``KOIFISH_DUMP_KERNELS=2`` or ``TrainCard.kernel_choices``).

Eligibility gates run at trace time (shapes are static under jit), so
each message naturally fires once per compiled shape; the seen-set
dedupes retraces.
"""
from __future__ import annotations

import os
import sys
from typing import Optional, Set, Tuple

_seen: Set[Tuple[str, str]] = set()
_verbose: Optional[bool] = None   # None = read env lazily


def _mode() -> int:
    """0 = silent, 1 = fallbacks on TPU, 2 = everything everywhere.
    KOIFISH_DUMP_KERNELS=0 is an ABSOLUTE kill switch — it wins over
    TrainCard.kernel_choices (the documented contract)."""
    env = os.environ.get("KOIFISH_DUMP_KERNELS", "1")
    try:
        lvl = int(env)
    except ValueError:
        lvl = 1
    if lvl == 0:
        return 0
    return 2 if _verbose else lvl


def set_verbose(on: bool) -> None:
    """TrainCard.kernel_choices hook: also log positive picks."""
    global _verbose
    _verbose = bool(on) or None


def reset() -> None:
    """Forget logged keys (tests)."""
    _seen.clear()


def _on_tpu() -> bool:
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _emit(tag: str, kernel: str, detail: str) -> None:
    key = (kernel, detail)
    if key in _seen:
        return
    _seen.add(key)
    print(f"[koifish] {tag}: {kernel} {detail}", file=sys.stderr, flush=True)


def fallback(kernel: str, reason: str) -> None:
    """The fused ``kernel`` was skipped for ``reason`` → XLA path engaged."""
    mode = _mode()
    if mode == 0 or (mode == 1 and not _on_tpu()):
        return
    _emit("kernel fallback -> XLA", kernel, f"({reason})")


def choice(kernel: str, desc: str) -> None:
    """The fused ``kernel`` WAS dispatched (verbose mode only)."""
    if _mode() < 2:
        return
    _emit("kernel choice", kernel, f"({desc})")
