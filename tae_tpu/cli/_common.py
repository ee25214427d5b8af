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
    # Opt-in persistent XLA compilation cache (TAE_TPU_COMPILE_CACHE=<dir>);
    # no default path: users opt in, benches pass a repo-local default.
    from tae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
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


def _wds_train_iter_batched(path: str, input_size: int, jitter_scale,
                            jitter_ratio, seed: int, process_index: int,
                            process_count: int, batch_size: int, u8: bool,
                            worker_id: int, num_workers: int):
    """Prebatched native train path: raw tar bytes -> fused C++ decode_batch
    straight into the batch buffer. The per-sample path loses ~40% of host
    time to the np.stack collate copy (measured, bench_input.py); here whole
    batches leave the decoder already assembled. Same stream semantics as
    _wds_train_iter (resampled infinite + 10k shuffle + torchvision-exact
    RRC box sampling + hflip). Yields exact-size batches always (the stream
    is infinite; rare undecodable images carry over to the next batch)."""
    import os as _os

    from tae_tpu.data import native
    from tae_tpu.data.transforms import _sample_rrc_box

    scale, ratio = tuple(jitter_scale), tuple(jitter_ratio)
    spec = ShardSpec.from_string(path, resampled=True,
                                 seed=seed + 1000 * process_index + worker_id)
    reader = WebDatasetReader(
        spec, decode=None, shuffle_buffer=10_000,
        shard_index=process_index * num_workers + worker_id,
        shard_count=process_count * num_workers)
    rng = np.random.default_rng(
        seed + 7919 * (process_index * num_workers + worker_id))
    # workers are single-core processes; only the inline (0-worker) loader
    # should fan the C++ decode pool across all cores
    threads = int(_os.environ.get("TAE_TPU_DECODE_THREADS",
                                  "0" if num_workers <= 1 else "1"))
    it = iter(reader)
    carry_imgs: list[np.ndarray] = []
    carry_cls: list[np.ndarray] = []
    carry_n = 0
    while True:
        need = batch_size - carry_n
        datas: list[bytes] = []
        clss: list[int] = []
        boxes = np.empty((need, 4), np.float32)
        flips = np.zeros((need,), np.int32)
        while len(datas) < need:
            sample = next(it)
            if "jpg" not in sample:
                continue
            data = bytes(sample["jpg"])
            try:
                w, h = native.jpeg_size(data)
            except ValueError:
                continue
            i = len(datas)
            top, left, bh, bw = _sample_rrc_box(rng, w, h, scale, ratio)
            boxes[i] = (left, top, left + bw, top + bh)
            flips[i] = rng.random() < 0.5
            datas.append(data)
            clss.append(_sample_cls(sample))
        decode = native.decode_batch_u8 if u8 else native.decode_batch
        imgs, keep = decode(datas, boxes, flips, input_size,
                            threads=threads, skip_failed=True)
        cls_arr = np.asarray(clss, np.int32)
        if keep is not None:
            cls_arr = cls_arr[keep]
        carry_imgs.append(imgs)
        carry_cls.append(cls_arr)
        carry_n += len(imgs)
        if carry_n < batch_size:
            continue  # rare decode failures: top up from the stream
        if len(carry_imgs) == 1:
            out = (carry_imgs[0], carry_cls[0])
            carry_imgs, carry_cls, carry_n = [], [], 0
        else:
            all_i = np.concatenate(carry_imgs)
            all_c = np.concatenate(carry_cls)
            out = (all_i[:batch_size], all_c[:batch_size])
            carry_imgs = [all_i[batch_size:]] if carry_n > batch_size else []
            carry_cls = [all_c[batch_size:]] if carry_n > batch_size else []
            carry_n -= batch_size
        yield out


def wds_train_loader(args, batch_size: int) -> BatchLoader:
    """The reference train pipeline (train.py:84-85): resampled infinite
    stream + 10k shuffle + RandomResizedCrop/flip/normalize.

    Uses the native prebatched decode path when libtaedata is available
    (decode straight into the batch buffer — the per-sample np.stack collate
    alone costs ~40% of host time, measured in bench_input.py); logs once
    which path is active. ``TAE_TPU_NATIVE_TRAIN=0`` forces the per-sample
    path."""
    import os as _os

    import jax

    from tae_tpu.data import native

    use_native = (native.available()
                  and _os.environ.get("TAE_TPU_NATIVE_TRAIN") != "0")
    u8 = bool(getattr(args, "device_normalize", False))
    if use_native:
        print(f"Input pipeline: native prebatched decode "
              f"({args.num_workers} workers, no collate copy"
              + (", uint8 H2D + on-device normalize" if u8 else "") + ")",
              flush=True)
        make_iter = functools.partial(
            _wds_train_iter_batched, args.train_data_path, args.input_size,
            getattr(args, "jitter_scale", [0.2, 1.0]),
            getattr(args, "jitter_ratio", [3 / 4, 4 / 3]),
            args.seed, jax.process_index(), jax.process_count(), batch_size,
            u8)
        return BatchLoader(make_iter, batch_size, num_workers=args.num_workers,
                           prebatched=True)
    if u8:
        print("WARNING: --device_normalize needs the native decoder "
              "(native/build.sh); shipping normalized f32 instead",
              flush=True)
    if native.available():
        print("Input pipeline: per-sample native decode + np.stack collate "
              "(TAE_TPU_NATIVE_TRAIN=0)", flush=True)
    else:
        print("WARNING: input pipeline on the per-sample PIL + np.stack "
              "collate path (~40% host-time collate tax; build "
              "native/build.sh for the prebatched native decoder)",
              flush=True)
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


def clamp_eval_batch(requested: int, model, params, mesh,
                     flag: str = "--batch_size_per_gpu") -> int:
    """HBM guard for the big eval batches the reference defaults to
    (reference evaluate.py:59-61 uses batch 8192, which cannot fit a 16 GB
    chip for the 2.5B+ configs without the mesh). Estimates the forward-pass
    footprint per device and clamps ``requested`` down to what fits, with an
    actionable message naming the fsdp flag.

    Per-device budget = 80% of HBM (``TAE_TPU_HBM_BYTES`` overrides; else the
    device's reported bytes_limit; else 16 GiB) minus the resident param
    bytes (measured exactly from the placed shardings). The per-sample
    activation model is the forward's live set: the fp32 input image and
    patchified target, two MLP-hidden-sized bf16 buffers in flight, a few
    residual-stream buffers, and the fp32 pred — validated against measured
    fits (p16 forward batch 1024 on a 16 GB v5e ~ 13 GB)."""
    import os

    import jax

    cfg = model.cfg
    dev = jax.devices()[0]
    hbm = int(os.environ.get("TAE_TPU_HBM_BYTES", "0"))
    if not hbm:
        try:
            hbm = int(dev.memory_stats()["bytes_limit"])
        except Exception:
            hbm = 16 << 30
    param_bytes = 0
    for leaf in jax.tree.leaves(params):
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            param_bytes += sum(s.data.nbytes for s in shards
                               if s.device == dev)
        else:
            param_bytes += getattr(leaf, "nbytes", 0)

    p = cfg.patch_size
    n_tok = (cfg.img_size // p) ** 2
    dmax = max(cfg.embed_dim, cfg.decoder_embed_dim)
    hidden = int(4 * dmax)
    act_per_sample = (
        2 * 3 * cfg.img_size ** 2 * 4          # image + patchify target, fp32
        + 2 * n_tok * hidden * 2               # MLP hidden buffers, bf16
        + 4 * n_tok * dmax * 4                 # residual-stream buffers
        + 2 * n_tok * p * p * 3 * 4            # pred + squared error, fp32
    )
    budget = int(hbm * 0.8) - param_bytes
    ways = mesh.shape["data"] * mesh.shape["fsdp"]
    if budget <= act_per_sample:
        raise SystemExit(
            f"Model params ({param_bytes / 1e9:.2f} GB/device) leave no HBM "
            f"for eval activations on a {hbm / 1e9:.2f} GB device. Shard the "
            f"params over more devices with --mesh_fsdp N (fsdp mesh axis).")
    max_batch = max(budget // act_per_sample * ways, ways)
    if requested <= max_batch:
        return requested
    clamped = max(max_batch // ways * ways, ways)
    print(f"Clamping {flag} {requested} -> {clamped}: the forward pass needs "
          f"~{act_per_sample * requested // ways / 1e9:.2f} GB/device of "
          f"activations on top of {param_bytes / 1e9:.2f} GB of params, but "
          f"each device has {hbm / 1e9:.2f} GB HBM. Use more devices or "
          f"--mesh_fsdp to raise the fit (or set TAE_TPU_HBM_BYTES to "
          f"override the estimate).")
    return clamped
