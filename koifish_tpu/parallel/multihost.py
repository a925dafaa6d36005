"""Multi-host launch support.

The mesh/sharding layer is host-count agnostic (`jax.devices()` returns
the global device set after `jax.distributed.initialize`), so multi-host
runs reuse everything: TP inside each host's ICI domain, DP/FSDP across
hosts over DCN (SURVEY.md §2.7/§5.8 plan — the reference has no
distributed execution at all).

Launch (same command on every host):

    python -m koifish_tpu.parallel.multihost \
        --coordinator host0:8476 --num-hosts N --host-id $ID -- \
        python -m koifish_tpu.cli.koifish cfg.json --dp N --tp 4

or call :func:`init_distributed` first thing in your own driver.

Single-host/this environment: everything no-ops gracefully (one process
owns all local devices), which is also how the CPU-mesh tests emulate
multi-chip.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR etc.).
    Returns True when a multi-process runtime was initialized."""
    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if not coordinator:
        return False
    num_processes = int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return True


def per_host_batch_slice(global_batch: int) -> slice:
    """Which slice of the global batch this host materializes (data is fed
    per host; jax.make_array_from_process_local_data assembles the global
    array)."""
    import jax
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    return slice(idx * per, (idx + 1) * per)


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser(prog="koifish-multihost")
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-hosts", type=int, required=True)
    ap.add_argument("--host-id", type=int, required=True)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    env = dict(os.environ,
               JAX_COORDINATOR=args.coordinator,
               JAX_NUM_PROCESSES=str(args.num_hosts),
               JAX_PROCESS_ID=str(args.host_id))
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
