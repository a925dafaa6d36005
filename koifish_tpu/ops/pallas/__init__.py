"""Pallas TPU kernels — the device-kernel layer (reference: src/Device/CUDA).

Each kernel has an XLA/jnp fallback used when the shape doesn't qualify or
the platform isn't TPU; tests validate kernel == fallback.
"""
