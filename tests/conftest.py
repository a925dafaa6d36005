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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


@pytest.fixture(autouse=True)
def _reset_ambient_switches():
    """Trace-time ambient switches (int8 training, sequence parallelism)
    must not leak across test cases — they are documented as
    set-before-trace globals, so each test starts clean."""
    yield
    from koifish_tpu.ops.attention import set_sequence_parallel
    from koifish_tpu.ops.int8_train import set_train_int8
    set_train_int8(False)
    set_sequence_parallel(None)
