from tae_tpu.models.registry import create, list_models, register_model  # noqa: F401
from tae_tpu.models import tae, recognition, segmentation  # noqa: F401  (populate registry)
from tae_tpu.models.tae import TAE, TAEConfig  # noqa: F401
from tae_tpu.models.recognition import RecognitionViT, RecognitionConfig  # noqa: F401
from tae_tpu.models.segmentation import SegmentationViT, SegmentationConfig  # noqa: F401
