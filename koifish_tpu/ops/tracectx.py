"""Scoped trace-time policies — the replacement for mutable module globals.

Round-2 carried two ambient switches (``set_train_int8``,
``set_sequence_parallel``) that were read at trace time from module
globals; they leaked across jit builders and test cases. These scopes
are the explicit version: a policy object pushed for exactly the
duration of one trace, exception-safe, thread-local (parallel test
runners / servers can trace concurrently without interference).

``make_train_step`` enters the scopes INSIDE the jitted step body, so
every (re)trace of that step sees its own card's policies and nothing
leaks to any other trace.
"""
from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Int8Policy:
    """Dynamic-range int8 training matmuls (ops/int8_train.py) — the TPU
    analog of the reference's FP8 GEMMs (operator.cuh:519-571)."""
    wgrad: bool = False
    # False | True/'fold' (scale-folded dy) | 'tile' (Pallas per-tile)
    dgrad: object = False
    min_weight_elems: int = 1 << 24   # K*N gate: head-sized and up

    def applies(self, shape) -> bool:
        return len(shape) == 2 and shape[0] * shape[1] >= self.min_weight_elems


@dataclasses.dataclass(frozen=True)
class SPPolicy:
    """Sequence-parallel training: full-sequence causal attention runs
    ring attention with T sharded over ``axis`` of ``mesh``."""
    axis: str
    mesh: object   # jax.sharding.Mesh (untyped: keep this module jax-free)


class _TLS(threading.local):
    def __init__(self):
        self.int8: list = []
        self.sp: list = []


_tls = _TLS()


@contextlib.contextmanager
def int8_scope(policy: Optional[Int8Policy]):
    """Pushing ``None`` explicitly disables int8 inside the scope."""
    _tls.int8.append(policy)
    try:
        yield
    finally:
        _tls.int8.pop()


def current_int8() -> Optional[Int8Policy]:
    return _tls.int8[-1] if _tls.int8 else None


@contextlib.contextmanager
def sp_scope(policy: Optional[SPPolicy]):
    _tls.sp.append(policy)
    try:
        yield
    finally:
        _tls.sp.pop()


def current_sp() -> Optional[SPPolicy]:
    return _tls.sp[-1] if _tls.sp else None
