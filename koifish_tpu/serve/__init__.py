from koifish_tpu.serve.kvcache import KVCache, init_cache, cache_for  # noqa: F401
from koifish_tpu.serve.engine import (  # noqa: F401
    prefill, decode_step, generate, jit_prefill, jit_decode_sample,
    jit_decode_sample_k, jit_decode_sample_layered,
    jit_decode_sample_layered_k, jit_decode_probs_k, jit_split_cache)
from koifish_tpu.serve.layered import (  # noqa: F401
    LayeredKVCache, init_layered_cache, join_cache, split_cache)
from koifish_tpu.serve.speculative import speculative_generate  # noqa: F401
from koifish_tpu.serve.paged import (  # noqa: F401
    PagedKVCache, generate_paged, init_paged_cache)
