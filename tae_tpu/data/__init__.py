from tae_tpu.data.tar_stream import ShardSpec, expand_shards, tar_samples, WebDatasetReader  # noqa: F401
from tae_tpu.data.transforms import (  # noqa: F401
    center_crop_transform,
    normalize,
    random_resized_crop_transform,
)
from tae_tpu.data.loader import BatchLoader, device_prefetch  # noqa: F401
from tae_tpu.data.imagefolder import ImageFolder  # noqa: F401
