"""Reconstruction evaluation driver — counterpart of reference evaluate.py.

Computes full-val mean MSE (mean of per-batch means, reference
evaluate.py:84-102) and optionally dumps an originals/reconstructions grid.

Deliberate fix (SURVEY.md §2.3): the reference's ``misc.load_model(args=...,
model_without_ddp=...)`` call crashes on a kwargs mismatch (evaluate.py:78);
here ``--resume`` actually loads the checkpoint (tae_tpu dir or reference
.pth) as intended.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.ckpt.io import load_params
from tae_tpu.cli import _common
from tae_tpu.parallel import shard_params
from tae_tpu.data.transforms import IMAGENET_STD
from tae_tpu.utils.dtypes import Policy
from tae_tpu.utils.image_grid import save_image


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("TAE evaluation", add_help=False)
    p.add_argument("--batch_size_per_gpu", default=8192, type=int)
    p.add_argument("--save_prefix", default="", type=str)
    p.add_argument("--model", default="", type=str)
    p.add_argument("--resume", default="", help="checkpoint to evaluate")
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--display", action="store_true")
    p.add_argument("--val_data_path", default="", type=str)
    p.add_argument("--output_dir", default="./output_dir")
    p.add_argument("--num_workers", default=16, type=int)
    _common.add_tpu_args(p)
    return p


def main(args) -> float:
    print(f"{args}".replace(", ", ",\n"))
    mesh = _common.build_mesh(args)
    model = _common.build_model(args.model, model_args=args.model_args)
    policy = Policy()

    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    params = shard_params(params, mesh)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Model: {args.model}; params (M): {n_params / 1e6}")

    if args.resume:
        params = load_params(args.resume, model, params)
        print(f"Loaded checkpoint {args.resume}")

    # the reference's batch 8192 default does not fit 16 GB HBM for the big
    # configs; clamp by a per-device footprint estimate instead of OOMing
    args.batch_size_per_gpu = _common.clamp_eval_batch(
        args.batch_size_per_gpu, model, params, mesh)

    @jax.jit
    def per_sample_loss_and_pred(p, imgs):
        z = model.forward_encoder(p, imgs, policy=policy, backend=args.attn_backend)
        pred = model.forward_decoder(p, z, policy=policy, backend=args.attn_backend)
        target = model.patchify(imgs).astype(jnp.float32)
        pred32 = pred.astype(jnp.float32)
        sq = jnp.square(pred32 - target)
        per = jnp.mean(sq, axis=(1, 2))
        # PSNR in [0,1] pixel space: undo the ImageNet normalization by
        # weighting each channel's squared error with std_c^2. The patchify
        # layout is (p, q, c) — channel varies fastest — so the per-channel
        # weights tile p^2 times along the last axis.
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        weights = jnp.tile(std * std, model.cfg.patch_size ** 2)
        mse_px = jnp.mean(sq * weights, axis=(1, 2))
        psnr = -10.0 * jnp.log10(jnp.maximum(mse_px, 1e-12))
        return per, psnr, pred

    loader = _common.imagefolder_val_loader(args.val_data_path, args.input_size,
                                            args.batch_size_per_gpu,
                                            num_workers=args.num_workers)
    print("Starting TAE evaluation!")
    import collections

    from tae_tpu.data.loader import device_prefetch
    from tae_tpu.parallel import batch_sharding

    losses = []
    psnrs = []
    samples_for_display = None
    real_counts: collections.deque[int] = collections.deque()

    def padded_batches():
        nonlocal samples_for_display
        for imgs, _ in loader:
            padded, n = _common.pad_batch(imgs, args.batch_size_per_gpu)
            if samples_for_display is None:
                # capture from the HOST batch: slicing the device-resident
                # sharded array instead would be a D2H fetch of image data
                # (KB/s-slow over a tunneled chip)
                samples_for_display = np.asarray(imgs[:min(8, n)])
            real_counts.append(n)
            yield padded

    # data-sharded, double-buffered eval inputs (the reference DDP-wraps
    # eval, evaluate.py:73; unsharded inputs would replicate onto one chip)
    for imgs in device_prefetch(padded_batches(),
                                sharding=batch_sharding(mesh)):
        n = real_counts.popleft()
        per, psnr, _ = per_sample_loss_and_pred(params, imgs)
        losses.append(float(np.asarray(per)[:n].mean()))
        psnrs.append(float(np.asarray(psnr)[:n].mean()))
    eval_loss = float(np.mean(losses))
    print(f"Eval loss: {eval_loss}")
    print(f"Eval PSNR: {float(np.mean(psnrs)):.2f} dB")

    if args.display and samples_for_display is not None:
        padded, n = _common.pad_batch(samples_for_display, args.batch_size_per_gpu)
        _, _, pred = per_sample_loss_and_pred(params, jnp.asarray(padded))
        recon = np.asarray(model.unpatchify(pred[:8]), dtype=np.float32)
        combined = np.concatenate([samples_for_display, recon], axis=0)
        out = Path(args.output_dir) / f"{args.save_prefix}_sample_reconstructions.jpg"
        save_image(combined, out, nrow=8, padding=1)
        print(f"Wrote {out}")
    return eval_loss


def cli_main() -> None:
    parser = get_args_parser()
    args = parser.parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
