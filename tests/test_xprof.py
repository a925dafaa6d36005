"""Device-trace op attribution (utils/xprof) — §5.1 profiling parity."""
import tempfile

import jax
import jax.numpy as jnp

from koifish_tpu.utils.profiler import trace
from koifish_tpu.utils.xprof import format_profile, op_profile


def test_op_profile_cpu_capture():
    d = tempfile.mkdtemp()
    f = jax.jit(lambda x: jnp.dot(x, x) + 1)
    x = jnp.ones((256, 256))
    f(x).block_until_ready()
    with trace(d):
        f(x).block_until_ready()
    rows = op_profile(d, device_substr="CPU")
    assert rows and rows[0].total_ms > 0
    txt = format_profile(rows)
    assert "dot" in txt.lower()
