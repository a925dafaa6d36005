"""Phase timers — the analog of the reference's global ``SUM`` profiler
(per-phase timers tQKV_forw/tFFN/tPreLogits/…, src/Utils/GST_util.hpp:
178-198, printed per chat turn / train step).

On TPU most phases live inside one jitted step, so fine-grained phase
attribution comes from ``jax.profiler`` traces; these host timers cover
the coarse phases the host can see (data, step, prefill, decode, sample)
plus `trace()` to capture a device profile.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Phase:
    DATA = "data"
    STEP = "step"
    PREFILL = "prefill"
    DECODE = "decode"
    SAMPLE = "sample"
    QUANT = "quant"
    CKPT = "ckpt"
    EVAL = "eval"


class PhaseTimers:
    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def report(self) -> str:
        parts = []
        for name in sorted(self.total, key=self.total.get, reverse=True):
            t, c = self.total[name], self.count[name]
            parts.append(f"{name}={t:.2f}s({c}x,{t / max(c, 1) * 1e3:.1f}ms)")
        return " ".join(parts)

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()


_global = PhaseTimers()


def get_timers() -> PhaseTimers:
    return _global


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/koifish_trace"):
    """Capture a device-level profile (perfetto) around a region."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
