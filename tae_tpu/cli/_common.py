"""Shared CLI plumbing: argument groups, mesh/model/dataset construction.

Flag names stay argparse-compatible with the reference drivers
(reference train.py:23-56 etc.) so launch scripts port with a module-name
change; TPU-native flags (mesh shape, remat, attention backend) are additive.
"""

from __future__ import annotations

import argparse
import functools

import numpy as np

from tae_tpu import models
from tae_tpu.data.loader import BatchLoader
from tae_tpu.data.tar_stream import ShardSpec, WebDatasetReader, decode_jpg_cls
from tae_tpu.data.transforms import center_crop_transform, random_resized_crop_transform
from tae_tpu.parallel import make_mesh


def add_tpu_args(parser: argparse.ArgumentParser) -> None:
    g = parser.add_argument_group("tpu")
    g.add_argument("--mesh_fsdp", default=1, type=int,
                   help="fsdp mesh axis size (parameter sharding)")
    g.add_argument("--mesh_tensor", default=1, type=int,
                   help="tensor-parallel mesh axis size")
    g.add_argument("--remat", action="store_true",
                   help="rematerialize block activations in backward")
    g.add_argument("--attn_backend", default=None, choices=[None, "pallas", "xla"],
                   help="attention kernel backend (default: auto)")
    g.add_argument("--seed", default=0, type=int, help="parameter init seed")
    g.add_argument("--compile", action="store_true",
                   help="accepted for reference-script compatibility; "
                        "jit is always on")
    g.add_argument("--device", default="tpu",
                   help="accepted for compatibility; placement is mesh-driven")
    g.add_argument("--dist_url", default="env://",
                   help="accepted for compatibility; multi-host rendezvous "
                        "is automatic on TPU pods")
    g.add_argument("--model_args", default="", type=str,
                   help="JSON dict of config overrides for the model factory "
                        "(e.g. '{\"embed_dim\": 64}'; used by tests/smoke runs)")


def build_mesh(args):
    return make_mesh(data=-1, fsdp=args.mesh_fsdp, tensor=args.mesh_tensor)


def maybe_quantize_encoder(enc_params, mode: str | None,
                           equalize: float = 0.0):
    """Frozen-encoder stages are pure inference: ``mode == "int8"`` rewrites
    the params to the w8a8 serving layout (quantized + per-layer unstacked;
    +34-84% measured encoder throughput, latent rel err ~3e-2 vs bf16).
    ``equalize`` > 0 applies the SmoothQuant-style LN-affine fold first
    (tae_tpu.ops.int8.equalize_params, alpha = the value)."""
    if mode is None:
        if equalize:
            raise ValueError("--encoder_equalize requires "
                             "--encoder_quantization int8")
        return enc_params
    if mode != "int8":
        raise ValueError(f"unknown encoder quantization {mode!r}")
    from tae_tpu.ops.int8 import prepare_serving_params

    return prepare_serving_params(enc_params, mode, equalize)


def build_model(name: str, model_args: str = "", **kwargs):
    if model_args:
        import json

        kwargs = {**json.loads(model_args), **kwargs}
    return models.create(name, **kwargs)


# ---------------------------------------------------------------------------
# dataset builders (picklable worker factories for BatchLoader)
# ---------------------------------------------------------------------------

def _sample_cls(sample: dict) -> int:
    cls = sample.get("cls", b"-1")
    return int(cls.decode()) if isinstance(cls, bytes) else int(cls)


def _wds_train_iter(path: str, input_size: int, jitter_scale, jitter_ratio,
                    seed: int, process_index: int, process_count: int,
                    worker_id: int, num_workers: int):
    from tae_tpu.data import native

    spec = ShardSpec.from_string(path, resampled=True,
                                 seed=seed + 1000 * process_index + worker_id)
    reader = WebDatasetReader(
        spec, decode=None, shuffle_buffer=10_000,
        shard_index=process_index * num_workers + worker_id,
        shard_count=process_count * num_workers)
    rng = np.random.default_rng(seed + 7919 * (process_index * num_workers + worker_id))
    use_native = native.available()
    tf = random_resized_crop_transform(input_size, scale=tuple(jitter_scale),
                                       ratio=tuple(jitter_ratio))
    for sample in reader:
        try:
            if use_native and "jpg" in sample:
                arr = native.random_resized_crop(
                    sample["jpg"], rng, input_size,
                    scale=tuple(jitter_scale), ratio=tuple(jitter_ratio))
            else:
                img, _ = decode_jpg_cls(sample)
                arr = tf(img, rng)
        except (ValueError, KeyError, OSError):
            continue
        yield arr, np.int32(_sample_cls(sample))


def wds_train_loader(args, batch_size: int) -> BatchLoader:
    """The reference train pipeline (train.py:84-85): resampled infinite
    stream + 10k shuffle + RandomResizedCrop/flip/normalize."""
    import jax

    make_iter = functools.partial(
        _wds_train_iter, args.train_data_path, args.input_size,
        getattr(args, "jitter_scale", [0.2, 1.0]),
        getattr(args, "jitter_ratio", [3 / 4, 4 / 3]),
        args.seed, jax.process_index(), jax.process_count())
    return BatchLoader(make_iter, batch_size, num_workers=args.num_workers)


def _imagefolder_val_iter(root: str, input_size: int, worker_id: int,
                          num_workers: int):
    from tae_tpu.data import native
    from tae_tpu.data.imagefolder import ImageFolder

    if native.available():
        # fused C++ decode for JPEGs (the ImageNet-val case); PIL fallback
        # per file for other formats
        ds = ImageFolder(root)
        tf = center_crop_transform(input_size, pad=32)
        for i in range(worker_id, len(ds.samples), num_workers):
            path, target = ds.samples[i]
            if path.suffix.lower() in (".jpg", ".jpeg"):
                try:
                    yield native.center_crop(path.read_bytes(), input_size), target
                    continue
                except ValueError:
                    pass
            img, _ = ImageFolder.__getitem__(ds, i)
            yield tf(img), target
        return
    ds = ImageFolder(root, transform=center_crop_transform(input_size, pad=32))
    yield from ds.iter_samples(worker_id, num_workers)


def imagefolder_val_loader(root: str, input_size: int, batch_size: int,
                           num_workers: int = 0) -> BatchLoader:
    """The reference val pipeline (train.py:87-89): sequential ImageFolder,
    Resize(+32)/CenterCrop/normalize. ``rebatch`` keeps the dataset tail to
    ONE partial batch across any worker count, preserving the reference's
    mean-of-batch-means eval metric (train.py:220)."""
    make_iter = functools.partial(_imagefolder_val_iter, root, input_size)
    return BatchLoader(make_iter, batch_size, num_workers=num_workers,
                       rebatch=num_workers > 0)


def pad_batch(batch: np.ndarray, target: int) -> tuple[np.ndarray, int]:
    """Pad a short final batch up to ``target`` rows (static shapes for jit);
    returns (padded, real_count)."""
    n = batch.shape[0]
    if n == target:
        return batch, n
    pad = np.repeat(batch[:1], target - n, axis=0)
    return np.concatenate([batch, pad], axis=0), n
