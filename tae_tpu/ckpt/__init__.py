from tae_tpu.ckpt.torch_import import (  # noqa: F401
    recognition_params_from_torch,
    segmentation_params_from_torch,
    tae_params_from_torch,
)
