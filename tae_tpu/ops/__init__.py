from tae_tpu.ops.patchify import extract_patches, patchify, unpatchify  # noqa: F401
from tae_tpu.ops.layernorm import layer_norm  # noqa: F401
from tae_tpu.ops.attention import attention  # noqa: F401
