from koifish_tpu.serve.kvcache import KVCache, init_cache, cache_for  # noqa: F401
from koifish_tpu.serve.engine import prefill, decode_step, generate  # noqa: F401
from koifish_tpu.serve.layered import (  # noqa: F401
    LayeredKVCache, join_cache, split_cache)
from koifish_tpu.serve.speculative import speculative_generate  # noqa: F401
from koifish_tpu.serve.paged import (  # noqa: F401
    PagedKVCache, generate_paged, init_paged_cache)
