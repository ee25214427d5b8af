"""ImageNet-1k latent-classifier fine-tune with eval.

Counterpart of reference recognition/train_recognition_in1k.py: epoch-based
training on ImageFolder data with RandomResizedCrop(bilinear) + RandAugment
+ MixUp/CutMix collate, label-smoothed CE, StepLR(90, 0.1), head-swap
transfer from an in19k checkpoint (build with 19167 classes, load, replace
head, reference :103-128), acc1/acc5 eval each epoch, and best-acc1-gated
checkpointing (reference :173-184). Frozen encoder + classifier run in one
jitted SPMD program (see train_recognition_in19k.py docstring).
"""

from __future__ import annotations

import argparse
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.ckpt.io import asdict_args, load_params, save_checkpoint
from tae_tpu.cli import _common
from tae_tpu.data.loader import BatchLoader, device_prefetch
from tae_tpu.data.mixup import mixup_cutmix_collate
from tae_tpu.data.randaugment import rand_augment
from tae_tpu.data.transforms import random_resized_crop_transform
from tae_tpu.parallel import batch_sharding, is_main_process, shard_params
from tae_tpu.train import TrainState, adamw, epoch_step_lr, make_train_step
from tae_tpu.train.losses import cross_entropy, topk_accuracy
from tae_tpu.utils.dtypes import Policy
from tae_tpu.utils.meters import DeviceMetricRing, MetricLogger, append_jsonl


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Downstream recognition fine-tune with eval",
                                add_help=False)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--save_prefix", default="", type=str)
    p.add_argument("--model", default="", type=str)
    p.add_argument("--model_ckpt", default="", type=str,
                   help="in19k-pretrained checkpoint; triggers head swap")
    p.add_argument("--pretrain_num_classes", default=19167, type=int,
                   help="class count the pretrained checkpoint was built with")
    p.add_argument("--num_classes", default=1000, type=int)
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--encoder", default="", type=str)
    p.add_argument("--encoder_ckpt", default="", type=str)
    p.add_argument("--encoder_args", default="", type=str)
    p.add_argument("--encoder_equalize", type=float, default=0.0,
                   help="SmoothQuant-style equalization alpha applied "
                        "before --encoder_quantization (0 = off)")
    p.add_argument("--encoder_quantization", default=None, choices=["int8"],
                   help="run the frozen encoder in the int8 w8a8 serving "
                        "layout (latent rel err ~3e-2 vs bf16)")
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--train_data_path", default="", type=str)
    p.add_argument("--val_data_path", default="", type=str)
    p.add_argument("--num_workers", default=16, type=int)
    p.add_argument("--output_dir", default="./output_dir")
    p.add_argument("--log_freq", default=50, type=int)
    _common.add_tpu_args(p)
    return p


def _train_iter(root: str, input_size: int, seed: int, worker_id: int,
                num_workers: int):
    from tae_tpu.data.imagefolder import ImageFolder

    rng = np.random.default_rng(seed + 31 * worker_id)
    tf = random_resized_crop_transform(
        input_size, interpolation="bilinear",
        post=functools.partial(rand_augment))
    ds = ImageFolder(root)
    order = rng.permutation(len(ds.samples))
    from PIL import Image

    for i in order[worker_id::num_workers]:
        path, target = ds.samples[int(i)]
        img = Image.open(path).convert("RGB")
        yield tf(img, rng), np.int64(target)


def main(args) -> None:
    print(f"{args}".replace(", ", ",\n"))
    mesh = _common.build_mesh(args)
    policy = Policy()

    # head-swap transfer: build with the pretrain label space, load, replace
    # the head with the target label space (reference :103-128)
    if args.model_ckpt:
        model = _common.build_model(args.model, model_args=args.model_args,
                                    num_classes=args.pretrain_num_classes)
    else:
        model = _common.build_model(args.model, model_args=args.model_args,
                                    num_classes=args.num_classes)
    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    if args.model_ckpt:
        params = load_params(args.model_ckpt, model, params)
        model, params = model.replace_head(params, jax.random.key(args.seed + 2),
                                           args.num_classes)
        print(f"Loaded {args.model_ckpt} and swapped head to "
              f"{args.num_classes} classes")
    params = shard_params(params, mesh)

    encoder = _common.build_model(args.encoder, model_args=args.encoder_args)
    enc_params = jax.jit(lambda k: encoder.init(k))(jax.random.key(args.seed + 1))
    enc_params = shard_params(enc_params, mesh)
    if args.encoder_ckpt:
        enc_params = load_params(args.encoder_ckpt, encoder, enc_params)
        print(f"Loaded encoder {args.encoder_ckpt}")
    enc_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, enc_params)
    # the frozen stage only ever runs forward_encoder — drop the decoder
    # half before (optionally) quantizing: ~half the resident encoder-side
    # weight HBM on the 3.4-4B configs (same rewrite as the encode CLI)
    from tae_tpu.tokenizer import prune_component

    enc_params = prune_component(enc_params, "encoder")
    enc_params = _common.maybe_quantize_encoder(
        enc_params, args.encoder_quantization, args.encoder_equalize)
    enc_policy = Policy(param_dtype=jnp.bfloat16)

    opt = adamw(weight_decay=args.weight_decay)
    state = TrainState.create(params, opt)

    def encode(imgs):
        return jax.lax.stop_gradient(encoder.forward_encoder(
            enc_params, imgs, policy=enc_policy, backend=args.attn_backend))

    def loss_fn(p, batch):
        imgs, soft_targets = batch
        logits = model.forward(p, encode(imgs), policy=policy,
                               backend=args.attn_backend, remat=args.remat)
        loss = cross_entropy(logits, soft_targets, label_smoothing=0.1)
        return loss, topk_accuracy(logits, soft_targets)

    step = jax.jit(
        make_train_step(loss_fn, opt, epoch_step_lr(args.lr, 90, 0.1),
                        accum_iter=args.accum_iter),
        donate_argnums=(0,))

    @jax.jit
    def eval_step(p, imgs, targets):
        logits = model.forward(p, encode(imgs), policy=policy,
                               backend=args.attn_backend)
        loss = cross_entropy(logits, targets)
        return loss, logits

    collate = mixup_cutmix_collate(args.num_classes, seed=args.seed)
    data_shard = batch_sharding(mesh)
    soft_shard = batch_sharding(mesh)

    best_eval_acc1 = 0.0
    print("Starting training!")
    for epoch in range(args.epochs):
        make_iter = functools.partial(_train_iter, args.train_data_path,
                                      args.input_size, args.seed + epoch)
        loader = BatchLoader(make_iter, args.batch_size * args.accum_iter,
                             num_workers=args.num_workers, drop_last=True)
        metric_logger = MetricLogger()
        # device-resident metric ring: one D2H per window, no per-iter
        # lockstep over the link (utils/meters.py:DeviceMetricRing)
        ring = DeviceMetricRing(("loss", "lr"), window=min(args.log_freq, 10))

        def mixed():
            for batch in loader:
                yield collate(batch)

        def on_metrics(pit, vals):
            metric_logger.update(**vals)
            if pit % args.log_freq == 0:
                print(f"ep {epoch} it {pit}: {metric_logger}", flush=True)

        for it, (imgs, soft) in enumerate(device_prefetch(
                mixed(), sharding=(data_shard, soft_shard))):
            state, metrics = step(state, (imgs, soft), jnp.int32(epoch))
            ring.consume(ring.push(it, metrics, force=it % args.log_freq == 0),
                         on_metrics)
        ring.consume(ring.drain(), on_metrics)

        print(f"Epoch {epoch}, evaluating ...")
        test_stats = evaluate(eval_step, state.params, args)

        if test_stats["acc1"] > best_eval_acc1:
            print("Best eval accuracy improved! Saving checkpoint.")
            save_checkpoint(
                Path(args.output_dir) / f"{args.save_prefix}_{args.model}_checkpoint",
                {"params": state.params, "opt": state.opt._asdict()},
                step=epoch, args=asdict_args(args),
                extra={"best_eval_acc1": float(test_stats["acc1"])})
            best_eval_acc1 = test_stats["acc1"]

        metric_logger.synchronize_between_processes()
        log_stats = {**{f"train_{k}": m.global_avg
                        for k, m in metric_logger.meters.items()},
                     **{f"test_{k}": v for k, v in test_stats.items()},
                     "epoch": epoch}
        if is_main_process():
            append_jsonl(Path(args.output_dir) /
                         f"{args.save_prefix}_{args.model}_log.txt", log_stats)


def evaluate(eval_step, params, args) -> dict[str, float]:
    """Per-epoch eval: sample-weighted acc1/acc5 + mean loss
    (reference :209-244)."""
    loader = _common.imagefolder_val_loader(args.val_data_path, args.input_size,
                                            args.batch_size, num_workers=0)
    logger = MetricLogger()
    for imgs, targets in loader:
        padded, n = _common.pad_batch(imgs, args.batch_size)
        tpad, _ = _common.pad_batch(np.asarray(targets), args.batch_size)
        loss, logits = eval_step(params, jnp.asarray(padded), jnp.asarray(tpad))
        logits = np.asarray(logits[:n], np.float32)
        t = np.asarray(targets)[:n]
        top5 = np.argsort(-logits, axis=-1)[:, :5]
        acc1 = 100.0 * float(np.mean(top5[:, 0] == t))
        acc5 = 100.0 * float(np.mean(np.any(top5 == t[:, None], axis=-1)))
        logger.update(loss=float(loss))
        logger.update(n=n, acc1=acc1, acc5=acc5)
    logger.synchronize_between_processes()
    stats = logger.global_avgs()
    print(f"* Acc@1 {stats.get('acc1', 0):.3f} Acc@5 {stats.get('acc5', 0):.3f} "
          f"loss {stats.get('loss', 0):.3f}")
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
