from koifish_tpu.ops.matmul import qmatmul, linear  # noqa: F401
from koifish_tpu.ops.norms import rmsnorm, layernorm  # noqa: F401
from koifish_tpu.ops.rope import rope_freqs, apply_rope  # noqa: F401
from koifish_tpu.ops.attention import causal_attention, decode_attention  # noqa: F401
from koifish_tpu.ops.cross_entropy import cross_entropy_loss  # noqa: F401
from koifish_tpu.ops.sampling import sample_logits  # noqa: F401
