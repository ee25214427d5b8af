from tae_tpu.nn import init  # noqa: F401
from tae_tpu.nn.vit import (  # noqa: F401
    AttentionConfig,
    BlockConfig,
    attention_apply,
    attention_init,
    block_apply,
    block_init,
    blocks_apply,
    blocks_init,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
    patch_embed_apply,
    patch_embed_init,
)
