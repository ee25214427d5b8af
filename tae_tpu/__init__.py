"""tae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) transformer-autoencoder framework.

Re-implements the full capability surface of the eminorhan/tae reference
(ViT encoder-decoder image tokenizers + downstream recognition/segmentation
training on frozen latents) with a TPU-first design:

- pure-functional model core (explicit param pytrees, jit-friendly)
- Pallas kernels for the hot ops (attention, fused LayerNorm) with XLA fallbacks
- bf16 compute policy (fp32 params / fp32 optimizer) instead of fp16+GradScaler
- SPMD parallelism over a `jax.sharding.Mesh` (data/fsdp/tensor axes)
- streaming webdataset-style input pipeline with a native JPEG decode path
- sharded checkpointing with positional-embedding interpolation and
  PyTorch-checkpoint import for parity testing
"""

__version__ = "0.1.0"

from tae_tpu.utils.dtypes import Policy  # noqa: F401
