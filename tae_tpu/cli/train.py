"""TAE training driver — TPU-native counterpart of reference train.py.

Same training semantics (iteration-based infinite webdataset stream, 2-level
step LR, grad accumulation, best-eval-loss checkpointing every ``save_freq``
iterations, JSONL logs, reconstruction grids, non-finite-loss abort,
reference train.py:59-223) with a TPU-native execution model:

  * one jitted SPMD train step over a (data, fsdp, tensor) mesh — forward,
    backward, AdamW update and metric scalars in a single XLA program;
  * bf16 compute / fp32 params instead of fp16 autocast + GradScaler;
  * double-buffered async host->device input, no per-step host syncs
    (metrics fetched at logging frequency);
  * eval-loss = mean of per-batch means, replicated exactly including the
    unequal final batch (reference train.py:203-223).

Run: ``python -m tae_tpu.cli.train --model tae_patch16_vocab16_px256
--train_data_path 'shards-{000000..000099}.tar' --val_data_path val/ ...``
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.ckpt.io import asdict_args, load_params, save_checkpoint
from tae_tpu.cli import _common
from tae_tpu.parallel import batch_sharding, is_main_process, shard_params
from tae_tpu.data.loader import device_prefetch
from tae_tpu.train import TrainState, adamw, make_train_step, step_lr
from tae_tpu.utils.dtypes import Policy
from tae_tpu.utils.image_grid import save_image
from tae_tpu.utils.meters import DeviceMetricRing, MetricLogger, append_jsonl


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("TAE training with webdataset streams", add_help=False)
    p.add_argument("--batch_size_per_gpu", default=256, type=int,
                   help="global batch = batch_size_per_gpu * accum_iter "
                        "(sharded over the data/fsdp mesh axes)")
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--save_prefix", default="", type=str)
    p.add_argument("--save_freq", default=10000, type=int)
    p.add_argument("--model", default="", type=str)
    p.add_argument("--ckpt", default="", help="load model weights from a "
                   "checkpoint (tae_tpu dir or reference .pth); training "
                   "restarts at iteration 0 (reference semantics)")
    p.add_argument("--resume_auto", action="store_true",
                   help="preemption-safe resume: restore params + optimizer "
                        "+ iteration from this run's own checkpoint if it "
                        "exists and continue where it left off")
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--display", action="store_true")
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--max_lr", type=float, default=1e-4)
    p.add_argument("--min_lr", type=float, default=1e-5)
    p.add_argument("--switch_it", type=int, default=900000)
    p.add_argument("--num_its", type=int, default=1000001)
    p.add_argument("--train_data_path", default="", type=str)
    p.add_argument("--val_data_path", default="", type=str)
    p.add_argument("--output_dir", default="./output_dir")
    p.add_argument("--num_workers", default=16, type=int)
    p.add_argument("--jitter_scale", default=[0.2, 1.0], type=float, nargs="+")
    p.add_argument("--jitter_ratio", default=[3.0 / 4.0, 4.0 / 3.0], type=float,
                   nargs="+")
    p.add_argument("--log_freq", default=50, type=int,
                   help="print training metrics every N iterations")
    p.add_argument("--device_normalize", action="store_true",
                   help="ship uint8 pixels and normalize on device (4x "
                        "smaller H2D copies; needs the native decoder)")
    _common.add_tpu_args(p)
    return p


def main(args) -> None:
    print(f"{args}".replace(", ", ",\n"))
    mesh = _common.build_mesh(args)
    print(f"mesh: {dict(mesh.shape)} over {jax.device_count()} devices")

    model = _common.build_model(args.model, model_args=args.model_args)
    policy = Policy()

    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    params = shard_params(params, mesh)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"Model: {args.model}; params (M): {n_params / 1e6}")

    opt = adamw(weight_decay=args.weight_decay)
    if args.ckpt:
        params = load_params(args.ckpt, model, params)
        print(f"Resumed checkpoint {args.ckpt}")
    state = TrainState.create(params, opt)

    start_it = 0
    best_eval_loss = 100.0
    ckpt_dir = Path(args.output_dir) / f"{args.save_prefix}_checkpoint"
    # "latest" is saved every save_freq regardless of eval (preemption
    # safety); ckpt_dir keeps the reference's best-eval contract
    # (train.py:164-172) via a local-disk promote, so a plateaued run
    # resumes from its newest state, not its last improvement.
    latest_dir = Path(args.output_dir) / f"{args.save_prefix}_checkpoint_latest"
    if args.resume_auto:
        from tae_tpu.ckpt.io import checkpoint_step, load_train_state

        resume_from = max((d for d in (ckpt_dir, latest_dir)
                           if checkpoint_step(d) is not None),
                          key=checkpoint_step, default=None)
        if resume_from is not None:
            params, opt_state, meta = load_train_state(resume_from, model,
                                                       params, state.opt)
            state = TrainState(params=params, opt=opt_state or state.opt)
            start_it = int(meta.get("step", 0)) + 1
            best_eval_loss = float(meta.get("best_eval_loss", best_eval_loss))
            print(f"Auto-resumed {resume_from} at iteration {start_it} "
                  f"(best eval loss {best_eval_loss})")

    from tae_tpu.data.transforms import maybe_device_normalize

    def loss_fn(p, imgs):
        # uint8 batches (--device_normalize) normalize on device; the
        # elementwise op fuses into the patch-embed read (transforms.py)
        imgs = maybe_device_normalize(imgs, model.cfg.patch_size, jnp.float32)
        loss, _ = model.forward(p, imgs, policy=policy,
                                backend=args.attn_backend, remat=args.remat)
        return loss, {}

    step = jax.jit(
        make_train_step(loss_fn, opt, step_lr(args.max_lr, args.min_lr,
                                              args.switch_it),
                        accum_iter=args.accum_iter),
        donate_argnums=(0,))

    def per_sample_loss(p, imgs):
        z = model.forward_encoder(p, imgs, policy=policy, backend=args.attn_backend)
        pred = model.forward_decoder(p, z, policy=policy, backend=args.attn_backend)
        target = model.patchify(imgs).astype(jnp.float32)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target), axis=(1, 2))

    eval_fn = jax.jit(per_sample_loss)

    data_shard = batch_sharding(mesh)
    train_loader = _common.wds_train_loader(
        args, args.batch_size_per_gpu * args.accum_iter)

    def train_batches():
        for imgs, _ in train_loader:
            yield imgs

    metric_logger = MetricLogger()
    display_samples = None

    # Device-resident metric ring (utils/meters.py:DeviceMetricRing):
    # per-iter values stay exact, one D2H transfer per window. The window
    # is capped at 10 so the dispatch run-ahead holds at most 10 batch
    # buffers in HBM. The reference checks math.isfinite(loss) every step
    # (train.py:152-155); here the abort fires at the next drain.
    ring = DeviceMetricRing(("loss", "lr", "grad_norm"),
                            window=min(args.log_freq, 10))

    def on_metrics(pit, vals):
        metric_logger.update(**vals)
        if pit % args.log_freq == 0:
            print(f"it {pit}: {metric_logger}", flush=True)

    print("Starting TAE training!")
    for it, imgs in enumerate(device_prefetch(train_batches(),
                                              sharding=data_shard),
                              start=start_it):
        if it >= args.num_its:
            break
        if args.display and it % args.save_freq == 0:
            display_samples = np.asarray(imgs[:8])

        state, metrics = step(state, imgs, jnp.int32(it))

        force = (it % args.log_freq == 0 or it % args.save_freq == 0
                 or it == args.num_its - 1)
        ring.consume(ring.push(it, metrics, force=force), on_metrics)

        if it != 0 and it % args.save_freq == 0:
            print(f"Iteration {it}, evaluating ...")
            eval_loss = evaluate(eval_fn, state.params, args, mesh)

            # JSONL row first: the eval trajectory is the run's primary
            # artifact and must not sit behind a checkpoint save (minutes
            # of D2H for a large TrainState on a tunneled link)
            metric_logger.synchronize_between_processes()
            log_stats = {**{f"train_{k}": m.global_avg
                            for k, m in metric_logger.meters.items()},
                         "eval_loss": float(eval_loss), "iteration": it}
            if is_main_process():
                append_jsonl(Path(args.output_dir) / f"{args.save_prefix}_log.txt",
                             log_stats)

            improved = eval_loss < best_eval_loss
            best_eval_loss = min(best_eval_loss, float(eval_loss))
            save_checkpoint(
                latest_dir,
                {"params": state.params, "opt": state.opt._asdict()},
                step=it, args=asdict_args(args),
                extra={"best_eval_loss": best_eval_loss,
                       "eval_loss": float(eval_loss)})
            if improved:
                print("Best eval loss improved! Saving checkpoint.")
                from tae_tpu.ckpt.io import promote_checkpoint

                promote_checkpoint(latest_dir, ckpt_dir)

            if args.display and display_samples is not None:
                if display_samples.dtype == np.uint8:
                    from tae_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

                    display_samples = ((display_samples.astype(np.float32) / 255.0
                                        - np.asarray(IMAGENET_MEAN).reshape(-1, 1, 1))
                                       / np.asarray(IMAGENET_STD).reshape(-1, 1, 1)
                                       ).astype(np.float32)
                _, pred = jax.jit(lambda p, x: model.forward(p, x, policy=policy))(
                    state.params, jnp.asarray(display_samples))
                recon = np.asarray(model.unpatchify(pred), dtype=np.float32)
                combined = np.concatenate([display_samples, recon], axis=0)
                save_image(combined,
                           Path(args.output_dir) /
                           f"{args.save_prefix}_reconstructions_iter_{it}.jpg",
                           nrow=8, padding=1)

            metric_logger = MetricLogger()

    # rows buffered when the data iterator ends before num_its
    ring.consume(ring.drain(), on_metrics)


def evaluate(eval_fn, params, args, mesh) -> float:
    """Full val pass; mean of per-batch mean MSE (reference train.py:203-223,
    including the unequal-final-batch averaging). Inputs are data-sharded
    over the mesh with async prefetch (the reference DDP-wraps eval,
    evaluate.py:73) and decoded by the configured worker pool."""
    import collections

    eval_bs = 8 * args.batch_size_per_gpu
    loader = _common.imagefolder_val_loader(args.val_data_path, args.input_size,
                                            eval_bs, num_workers=args.num_workers)
    real_counts: collections.deque[int] = collections.deque()

    def padded_batches():
        for imgs, _ in loader:
            padded, n = _common.pad_batch(imgs, eval_bs)
            real_counts.append(n)
            yield padded

    losses = []
    for imgs in device_prefetch(padded_batches(), sharding=batch_sharding(mesh)):
        per = np.asarray(eval_fn(params, imgs))
        losses.append(float(per[:real_counts.popleft()].mean()))
    eval_loss = float(np.mean(losses))
    print(f"Current eval loss: {eval_loss}")
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
