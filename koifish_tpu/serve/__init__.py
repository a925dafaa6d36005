from koifish_tpu.serve.kvcache import KVCache, init_cache, cache_for  # noqa: F401
from koifish_tpu.serve.engine import prefill, decode_step, generate  # noqa: F401
