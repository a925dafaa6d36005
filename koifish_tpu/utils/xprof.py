"""XPlane trace analysis — per-op device-time attribution for TPU runs.

The reference ships SUM/profiler counters printed at phase level
(reference: src/ggex/GST_util.hpp SUM::, Optimizer.cpp timing prints).
On TPU the ground truth is the XLA device trace: ``jax.profiler`` writes
an ``*.xplane.pb`` per host under ``<logdir>/plugins/profile/<run>/``.
The usual parsers (tensorflow / xprof's pywrap) aren't available in
minimal images, so this module carries a ~100-line protobuf *wire
format* reader for the XSpace schema — no generated code needed — and
aggregates per-op device time, giving the per-phase in-step attribution
the host-side timers can't see (dispatch is async; host timers only
bound whole steps).

Usage:
    with trace("/tmp/prof"):          # jax.profiler.trace wrapper
        run_steps()
    report = analyze("/tmp/prof")     # {op_name: ms}
    print(format_report(report, steps=3, flops_per_step=...))

CLI: python -m koifish_tpu.utils.xprof /tmp/prof --steps 3
"""
from __future__ import annotations

import glob
import os
import struct
from typing import Dict, Iterator, List, Tuple

# ---------------------------------------------------------------- wire format


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_no, wire_type, value) over a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:  # groups (3/4) unused by xplane
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _parse_event(buf: bytes) -> Tuple[int, int]:
    """XEvent -> (metadata_id, duration_ps)."""
    mid = dur = 0
    for fno, _, v in _fields(buf):
        if fno == 1:
            mid = v
        elif fno == 3:
            dur = v
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    """XLine -> (name, [(metadata_id, duration_ps)])."""
    name, events = "", []
    for fno, _, v in _fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_meta_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key, name = 0, ""
    for fno, _, v in _fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:  # XEventMetadata
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


class Plane:
    def __init__(self, name: str):
        self.name = name
        self.lines: List[Tuple[str, List[Tuple[int, int]]]] = []
        self.meta: Dict[int, str] = {}


def parse_xspace(path: str) -> List[Plane]:
    with open(path, "rb") as f:
        data = f.read()
    planes = []
    for fno, _, v in _fields(data):
        if fno != 1:
            continue
        plane = Plane("")
        for f2, _, v2 in _fields(v):
            if f2 == 2:
                plane.name = v2.decode("utf-8", "replace")
            elif f2 == 3:
                plane.lines.append(_parse_line(v2))
            elif f2 == 4:
                k, nm = _parse_meta_entry(v2)
                plane.meta[k] = nm
        planes.append(plane)
    return planes


# ---------------------------------------------------------------- aggregation


def analyze(logdir: str, device_only: bool = True) -> Dict[str, float]:
    """Aggregate per-op device time (ms) from the newest trace in logdir."""
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    out: Dict[str, float] = {}
    for plane in parse_xspace(paths[-1]):
        is_dev = plane.name.startswith(("/device:TPU", "/device:GPU", "TPU"))
        if device_only and not is_dev:
            continue
        # "XLA Ops" is the serial per-op timeline; "Steps"/"XLA Modules"
        # are whole-program envelopes and "Async XLA Ops" are overlapped
        # DMAs — counting those double-counts wall time
        named = dict(plane.lines)
        op_lines = ([("XLA Ops", named["XLA Ops"])] if "XLA Ops" in named
                    else plane.lines)
        for line_name, events in op_lines:
            if line_name in ("Steps", "XLA Modules", "Async XLA Ops"):
                continue
            for mid, dur_ps in events:
                name = plane.meta.get(mid, f"op#{mid}")
                out[name] = out.get(name, 0.0) + dur_ps / 1e9
    return out


_CLASSES = (
    ("matmul", ("fusion.gemm", "dot", "convolution", "gemm")),
    ("pallas", ("custom-call", "flash", "tpu_custom_call")),
    ("copy/transpose", ("copy", "transpose", "bitcast")),
    ("reduce", ("reduce", "all-reduce")),
    ("elementwise", ("fusion", "add", "multiply", "select", "broadcast",
                     "convert", "compare", "exponential", "log", "tanh",
                     "maximum", "subtract", "divide", "rsqrt", "power")),
    ("data", ("dynamic-slice", "dynamic-update-slice", "gather", "scatter",
              "slice", "concatenate", "iota", "reshape", "pad")),
    ("rng", ("rng",)),
)


def classify(name: str) -> str:
    low = name.lower()
    for cls, pats in _CLASSES:
        if any(p in low for p in pats):
            return cls
    return "other"


def format_report(per_op: Dict[str, float], steps: int = 1,
                  flops_per_step: float = 0.0, top: int = 25,
                  peak_tflops: float = 197.0) -> str:
    """Pretty per-op + per-class report; optional MFU if flops given."""
    total = sum(per_op.values())
    lines = [f"device total: {total/steps:.2f} ms/step ({total:.1f} ms "
             f"over {steps} steps)"]
    if flops_per_step:
        mfu = flops_per_step / (total / steps / 1e3) / (peak_tflops * 1e12)
        lines.append(f"MFU: {100*mfu:.1f}% of {peak_tflops} TF/s peak")
    by_cls: Dict[str, float] = {}
    for name, ms in per_op.items():
        by_cls[classify(name)] = by_cls.get(classify(name), 0.0) + ms
    lines.append("-- by class --")
    for cls, ms in sorted(by_cls.items(), key=lambda kv: -kv[1]):
        lines.append(f"{ms/steps:9.3f} ms/step  {100*ms/total:5.1f}%  {cls}")
    lines.append(f"-- top {top} ops --")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"{ms/steps:9.3f} ms/step  {100*ms/total:5.1f}%  "
                     f"{name[:100]}")
    return "\n".join(lines)


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--flops", type=float, default=0.0)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    print(format_report(analyze(args.logdir), steps=args.steps,
                        flops_per_step=args.flops, top=args.top))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
