from koifish_tpu.models.transformer import (  # noqa: F401
    init_params, model_forward, layer_forward, lm_head, gather_embed,
)
