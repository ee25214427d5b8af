"""Image transforms matching torchvision semantics (PIL backend).

The reference's canonical pipelines (SURVEY.md §2.4) are reproduced
operation-for-operation so val-path preprocessing is deterministic-identical
and train-path augmentation is distributionally identical:

  * train (reference train.py:76-81): RandomResizedCrop(size, scale=[0.2,1],
    ratio=[3/4,4/3], bicubic) -> RandomHorizontalFlip -> ToTensor ->
    Normalize(imagenet mean/std)
  * val (reference train.py:68-73): Resize(size+32, bicubic) ->
    CenterCrop(size) -> ToTensor -> Normalize

``RandomResizedCrop`` copies torchvision's exact sampling procedure (10
area/log-ratio attempts, center-crop fallback) and performs crop+resize in a
single PIL ``resize(box=...)`` call — same result, one resampling pass.

Outputs are numpy (C, H, W) float32, normalized.
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
_BICUBIC = Image.Resampling.BICUBIC
_INTERP = {"bicubic": Image.Resampling.BICUBIC, "bilinear": Image.Resampling.BILINEAR,
           "nearest": Image.Resampling.NEAREST, "lanczos": Image.Resampling.LANCZOS}


def to_array(img: Image.Image) -> np.ndarray:
    """ToTensor: PIL -> float32 (C, H, W) in [0, 1]."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def normalize(arr: np.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, np.float32).reshape(-1, 1, 1)
    return (arr - mean) / std


def device_normalize(x, dtype=None, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """On-device ToTensor+Normalize for uint8 (…, C, H, W) batches.

    Pairs with :func:`tae_tpu.data.native.decode_batch_u8`: the host ships
    uint8 (4x fewer host->device bytes than f32) and this folds /255, -mean,
    /std into one elementwise op that XLA fuses into the consumer (the
    patch-embed matmul read) — the normalization itself becomes free."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    mean = jnp.asarray(mean, dtype).reshape(-1, 1, 1) * 255.0
    inv = 1.0 / (jnp.asarray(std, dtype).reshape(-1, 1, 1) * 255.0)
    return (x.astype(dtype) - mean) * inv


def device_normalize_patches(x, patch_size: int, dtype=None,
                             mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """On-device normalize for pre-patchified uint8 (…, N, C·p²) batches in
    extract_patches layout (channel-major per patch)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    p2 = patch_size * patch_size
    mean = jnp.repeat(jnp.asarray(mean, dtype), p2) * 255.0
    inv = 1.0 / (jnp.repeat(jnp.asarray(std, dtype), p2) * 255.0)
    return (x.astype(dtype) - mean) * inv


def maybe_device_normalize(x, patch_size: int, dtype):
    """Dispatch for encoder inputs: uint8 batches (the native decoder's
    device-normalize path) are normalized on device — CHW rank-4 via
    :func:`device_normalize`, pre-patchified rank-3 via
    :func:`device_normalize_patches`; float inputs pass through (the data
    layer already normalized them)."""
    import jax.numpy as jnp

    if x.dtype != jnp.uint8:
        return x
    if x.ndim == 4:
        return device_normalize(x, dtype)
    return device_normalize_patches(x, patch_size, dtype)


def _sample_rrc_box(rng: np.random.Generator, width: int, height: int,
                    scale: tuple[float, float], ratio: tuple[float, float]
                    ) -> tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params: returns (top, left, h, w)."""
    area = float(height * width)
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # fallback: clamp aspect, center crop
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def random_resized_crop_transform(size: int, scale=(0.2, 1.0),
                                  ratio=(3.0 / 4.0, 4.0 / 3.0),
                                  hflip: bool = True,
                                  mean=IMAGENET_MEAN, std=IMAGENET_STD,
                                  interpolation: str = "bicubic",
                                  post=None,
                                  ) -> Callable[[Image.Image, np.random.Generator], np.ndarray]:
    """The reference train transform. Takes (PIL image, per-worker RNG).

    ``interpolation``: bicubic for TAE training (train.py:77), bilinear for
    the in1k fine-tune (recognition/train_recognition_in1k.py:80).
    ``post``: optional PIL-level hook applied after crop+flip (RandAugment).
    """
    resample = _INTERP[interpolation]

    def apply(img: Image.Image, rng: np.random.Generator) -> np.ndarray:
        top, left, h, w = _sample_rrc_box(rng, img.width, img.height, scale, ratio)
        img = img.resize((size, size), resample, box=(left, top, left + w, top + h))
        if hflip and rng.random() < 0.5:
            img = img.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
        if post is not None:
            img = post(img, rng)
        return normalize(to_array(img), mean, std)

    return apply


def resize_shorter(img: Image.Image, size: int,
                   interpolation: str = "bicubic") -> Image.Image:
    """torchvision Resize(int): scale shorter side to ``size``, keep aspect."""
    w, h = img.size
    if w <= h:
        new = (size, max(1, int(round(h * size / w))))
    else:
        new = (max(1, int(round(w * size / h))), size)
    return img.resize(new, _INTERP[interpolation])


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def center_crop_transform(size: int, pad: int = 32, mean=IMAGENET_MEAN,
                          std=IMAGENET_STD,
                          interpolation: str = "bicubic"
                          ) -> Callable[[Image.Image], np.ndarray]:
    """The reference val transform: Resize(size+pad) -> CenterCrop(size)."""
    def apply(img: Image.Image) -> np.ndarray:
        img = center_crop(resize_shorter(img, size + pad, interpolation), size)
        return normalize(to_array(img), mean, std)

    return apply
