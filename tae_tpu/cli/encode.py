"""Dataset tokenization driver — counterpart of reference encode.py.

Runs the frozen TAE encoder over a webdataset stream and writes
``{latents, targets}``. Two deliberate TPU-native upgrades over the
reference (SURVEY.md §3.3):

  * **streamed sharded output**: latents are flushed to numbered ``.npz``
    shards every ``--shard_size`` samples instead of accumulating the whole
    dataset in host RAM (the reference concatenates everything and asks for
    750 GB, encode.py:87-100 + scripts/encode.sh:7);
  * **double-buffered input**: JPEG decode workers + async H2D overlap keep
    the chip busy (BASELINE.json north-star path).

Like the reference, the default transform is the *train-style* random crop
(encode.py:55-60); pass ``--deterministic`` for the val-style center crop.
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import numpy as np

from tae_tpu.ckpt.io import load_params
from tae_tpu.cli import _common
from tae_tpu.data.loader import BatchLoader
from tae_tpu.data.tar_stream import ShardSpec, WebDatasetReader, decode_jpg_cls
from tae_tpu.data.transforms import center_crop_transform, random_resized_crop_transform
from tae_tpu.parallel import batch_sharding, shard_params
from tae_tpu.utils.dtypes import Policy


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Encode a dataset with a TAE", add_help=False)
    p.add_argument("--batch_size", default=1024, type=int)
    p.add_argument("--num_iters", default=10000, type=int,
                   help="max number of batches to encode")
    p.add_argument("--model", default="", type=str)
    p.add_argument("--model_ckpt", default="", type=str)
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--num_workers", default=16, type=int)
    p.add_argument("--output_dir", default="", type=str)
    p.add_argument("--save_prefix", default="", type=str)
    p.add_argument("--shard_size", default=65536, type=int,
                   help="samples per output shard")
    p.add_argument("--deterministic", action="store_true",
                   help="use the val transform instead of the reference's "
                        "train-style random crop")
    _common.add_tpu_args(p)
    return p


def _encode_iter(path: str, input_size: int, deterministic: bool, seed: int,
                 worker_id: int, num_workers: int):
    from tae_tpu.data import native

    spec = ShardSpec.from_string(path, resampled=False)
    use_native = native.available()
    reader = WebDatasetReader(spec, decode=None if use_native else decode_jpg_cls,
                              shard_index=worker_id, shard_count=num_workers)
    rng = np.random.default_rng(seed + worker_id)
    if use_native:
        # fused decode+crop+resample+normalize in C++ (native/taedata.cpp)
        for sample in reader:
            try:
                data = sample["jpg"]
                arr = (native.center_crop(data, input_size) if deterministic
                       else native.random_resized_crop(data, rng, input_size))
            except (ValueError, KeyError, OSError):
                continue
            cls = sample.get("cls", b"-1")
            cls = int(cls.decode()) if isinstance(cls, bytes) else int(cls)
            yield arr, np.int32(cls)
    elif deterministic:
        tf = center_crop_transform(input_size, pad=32)
        for img, cls in reader:
            yield tf(img), np.int32(cls)
    else:
        tf = random_resized_crop_transform(input_size)
        for img, cls in reader:
            yield tf(img, rng), np.int32(cls)


class ShardWriter:
    """Accumulate (latents, targets) and flush ``.npz`` shards + an index."""

    def __init__(self, output_dir: Path, prefix: str, shard_size: int):
        self.dir = output_dir
        self.prefix = prefix
        self.shard_size = shard_size
        self.buf_z: list[np.ndarray] = []
        self.buf_t: list[np.ndarray] = []
        self.buffered = 0
        self.shards: list[dict] = []

    def add(self, latents: np.ndarray, targets: np.ndarray) -> None:
        self.buf_z.append(latents)
        self.buf_t.append(targets)
        self.buffered += latents.shape[0]
        while self.buffered >= self.shard_size:
            self._flush(self.shard_size)

    def _flush(self, count: int) -> None:
        z = np.concatenate(self.buf_z, axis=0)
        t = np.concatenate(self.buf_t, axis=0)
        out_z, rest_z = z[:count], z[count:]
        out_t, rest_t = t[:count], t[count:]
        idx = len(self.shards)
        path = self.dir / f"{self.prefix}_latents-{idx:06d}.npz"
        np.savez(path, latents=out_z, targets=out_t)
        self.shards.append({"path": path.name, "num_samples": int(out_z.shape[0])})
        self.buf_z, self.buf_t = [rest_z], [rest_t]
        self.buffered = int(rest_z.shape[0])
        print(f"wrote {path} ({out_z.shape[0]} samples)")

    def close(self) -> None:
        if self.buffered:
            self._flush(self.buffered)
        index = {"shards": self.shards,
                 "num_samples": int(sum(s["num_samples"] for s in self.shards))}
        (self.dir / f"{self.prefix}_index.json").write_text(json.dumps(index, indent=2))


def main(args) -> dict:
    print(f"{args}".replace(", ", ",\n"))
    mesh = _common.build_mesh(args)
    model = _common.build_model(args.model, model_args=args.model_args)
    policy = Policy()

    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    params = shard_params(params, mesh)
    if args.model_ckpt:
        params = load_params(args.model_ckpt, model, params)
        print(f"Loaded checkpoint {args.model_ckpt}")

    encode_fn = jax.jit(lambda p, x: model.forward_encoder(
        p, x, policy=policy, backend=args.attn_backend))

    make_iter = functools.partial(_encode_iter, args.data_path, args.input_size,
                                  args.deterministic, args.seed)
    loader = BatchLoader(make_iter, args.batch_size, num_workers=args.num_workers)
    data_shard = batch_sharding(mesh)

    writer = ShardWriter(Path(args.output_dir), args.save_prefix, args.shard_size)
    t0 = time.time()
    n_imgs = 0
    pending = None  # overlap D2H of batch k with compute of batch k+1
    for it, (imgs, targets) in enumerate(loader):
        if it == args.num_iters:
            break
        padded, n = _common.pad_batch(imgs, args.batch_size)
        z = encode_fn(params, jax.device_put(padded, data_shard))
        if pending is not None:
            zz, tt, nn = pending
            writer.add(np.asarray(zz)[:nn].astype(np.float16), tt)
        pending = (z, np.asarray(targets), n)
        n_imgs += n
        if it % 100 == 0:
            print(f"Iteration {it}: {n_imgs / max(time.time() - t0, 1e-9):.0f} img/s")
    if pending is not None:
        zz, tt, nn = pending
        writer.add(np.asarray(zz)[:nn].astype(np.float16), tt)
    writer.close()
    dt = time.time() - t0
    stats = {"num_samples": n_imgs, "seconds": dt,
             "images_per_sec": n_imgs / max(dt, 1e-9)}
    print(f"Encoded {n_imgs} samples in {dt:.1f}s "
          f"({stats['images_per_sec']:.0f} img/s)")
    return stats


def cli_main() -> None:
    parser = get_args_parser()
    args = parser.parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
