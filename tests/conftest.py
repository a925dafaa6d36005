"""Test env: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §7 layer 5).

Note: this image's sitecustomize imports jax and registers the remote
"axon" TPU plugin in every Python process, so env vars alone are too
late — use jax.config (backend selection is still lazy at this point).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402 (already imported by sitecustomize; config still applies)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# NB: the round-2 autouse reset fixture for ambient trace-time switches is
# gone — int8/sequence-parallel are now trace-scoped policies
# (koifish_tpu/ops/tracectx.py) that cannot leak across tests.
