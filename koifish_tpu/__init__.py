"""koifish_tpu — a TPU-native quantized LLM training & inference framework.

A from-scratch rebuild of the capabilities of gruai/koifish (C++/CUDA,
see /root/reference) designed idiomatically for JAX/XLA/Pallas/pjit:

- hybrid 16/8/4/2/1-bit weight-only quantization as packed tiles with
  Pallas dequant-fused matmuls (reference: src/Tensor/GeQuant.cpp,
  src/Device/CUDA/kernel/quantizer.cu)
- quantized ring-buffer KV cache with StreamingLLM attention sinks
  (reference: src/Device/Pipe.hpp:160)
- quantize-at-load from HF/AWQ safetensors (reference: src/Manifold/Serialize.cpp)
- pretraining / SFT / QAT with AdamW & Muon (reference: src/Manifold/Optimizer.cpp)
- tensor/data/expert-sharded execution over jax.sharding Meshes — a
  capability the single-GPU reference lacks (SURVEY.md §2.7)
"""

__version__ = "0.1.0"

from koifish_tpu.config import CLIParams, ModelCard, QuantCard, TrainCard  # noqa: F401
from koifish_tpu.dtypes import QFormat  # noqa: F401
