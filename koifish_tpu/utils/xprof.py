"""Offline xplane trace analysis — per-op device-time attribution.

The reference prints per-phase timers (``SUM``: tQKV_forw/tFFN/...,
GST_util.hpp:178-198). Under XLA one jitted step is a single executable,
so phase attribution must come from the device trace. This module turns
a ``jax.profiler`` capture (``utils.profiler.trace``) into a ranked
op-time table — the tool that found round 2's decode bottleneck (cache
scatter/copy plumbing at 80% of step time).

Usage::

    from koifish_tpu.utils.profiler import trace
    from koifish_tpu.utils.xprof import op_profile, format_profile
    with trace("/tmp/tr"):
        step(...)           # + host sync
    print(format_profile(op_profile("/tmp/tr")))

Requires the tensorflow xplane proto (present in this image via
tensorboard-plugin-profile's tensorflow dep); degrades with a clear
error when unavailable.
"""
from __future__ import annotations

import collections
import glob
import os
from typing import Dict, List, NamedTuple


class OpTime(NamedTuple):
    name: str
    total_ms: float
    count: int


def _load_xplane():
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
        return xplane_pb2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "xplane proto unavailable (needs the tensorflow profiler protos);"
            " inspect the trace with tensorboard instead") from e


def op_profile(log_dir: str, device_substr: str = "TPU",
               top: int = 30) -> List[OpTime]:
    """Aggregate per-op device time from the newest xplane capture under
    ``log_dir``. ``device_substr`` selects the device plane ("TPU", or
    "CPU" for host-platform captures in tests)."""
    xplane_pb2 = _load_xplane()
    files = sorted(glob.glob(os.path.join(
        log_dir, "plugins/profile/*/*.xplane.pb")))
    if not files:
        raise FileNotFoundError(f"no xplane capture under {log_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    tot: Dict[str, float] = collections.Counter()
    cnt: Dict[str, int] = collections.Counter()
    for plane in xs.planes:
        if device_substr.lower() not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9   # ps -> ms
                cnt[name] += 1
    rows = [OpTime(n, t, cnt[n]) for n, t in tot.items()]
    rows.sort(key=lambda r: -r.total_ms)
    return rows[:top]


def format_profile(rows: List[OpTime], width: int = 100) -> str:
    total = sum(r.total_ms for r in rows)
    out = [f"{'ms':>10} {'%':>6} {'count':>7}  op"]
    for r in rows:
        pct = 100.0 * r.total_ms / total if total else 0.0
        out.append(f"{r.total_ms:10.3f} {pct:6.1f} {r.count:7d}  "
                   f"{r.name[:width]}")
    return "\n".join(out)
