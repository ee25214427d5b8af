"""Semantic-segmentation training on frozen TAE latents.

Counterpart of reference segmentation/train.py: epoch-based COCO(->VOC-21)
dense prediction with the ``out + 0.5·aux`` cross-entropy criterion
(ignore_index 255, reference :49-57), ConfusionMatrix/mIoU evaluation
(:60-85), per-epoch checkpointing (:168-176), StepLR(90, 0.1) (:151), and
head-swap transfer from an in1k-pretrained checkpoint (:133-136,156-157).
Frozen encoder + segmenter run in one jitted SPMD program.
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
from tae_tpu.data.coco_seg import load_dataset
from tae_tpu.data.loader import BatchLoader, device_prefetch
from tae_tpu.data.seg_transforms import SegEvalTransform, SegTrainTransform
from tae_tpu.parallel import batch_sharding, is_main_process, shard_params
from tae_tpu.train import TrainState, adamw, epoch_step_lr, make_train_step
from tae_tpu.utils.confusion import ConfusionMatrix
from tae_tpu.utils.dtypes import Policy
from tae_tpu.utils.meters import DeviceMetricRing, MetricLogger, append_jsonl


def get_args_parser(add_help: bool = True) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Segmentation training on TAE latents",
                                add_help=add_help)
    p.add_argument("--data_path", default="", type=str)
    p.add_argument("--dataset", default="coco", type=str,
                   choices=["coco", "voc", "voc_aug"])
    p.add_argument("--model", default="", type=str)
    p.add_argument("--model_ckpt", default="", type=str)
    p.add_argument("--pretrain_num_classes", default=1000, type=int)
    p.add_argument("--encoder", default="", type=str)
    p.add_argument("--encoder_ckpt", default="", type=str)
    p.add_argument("--encoder_args", default="", type=str)
    p.add_argument("--encoder_quantization", default=None, choices=["int8"],
                   help="run the frozen encoder in the int8 w8a8 serving "
                        "layout (latent rel err ~3e-2 vs bf16)")
    p.add_argument("--aux_loss", action="store_true",
                   help="accepted for compatibility; the model always has an "
                        "aux head and the criterion always adds 0.5*aux")
    p.add_argument("--batch_size_per_gpu", default=8, type=int)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--workers", default=16, type=int)
    p.add_argument("--lr", default=0.01, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--print_freq", default=10, type=int)
    p.add_argument("--output_dir", default=".", type=str)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--world_size", default=1, type=int)
    _common.add_tpu_args(p)
    return p


def masked_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                         ignore: int = 255) -> jnp.ndarray:
    """CE over (B, C, H, W) dense logits with ignore_index semantics
    (mean over non-ignored pixels, like torch F.cross_entropy)."""
    b, c, h, w = logits.shape
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    valid = target != ignore
    t = jnp.where(valid, target, 0)
    picked = jnp.take_along_axis(lp, t[:, None].astype(jnp.int32), axis=1)[:, 0]
    losses = jnp.where(valid, -picked, 0.0)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(valid), 1)


def criterion(out: dict[str, jnp.ndarray], target: jnp.ndarray) -> jnp.ndarray:
    """out + 0.5 * aux (reference segmentation/train.py:49-57)."""
    return (masked_cross_entropy(out["out"], target)
            + 0.5 * masked_cross_entropy(out["aux"], target))


def _train_iter(args_tuple, worker_id: int, num_workers: int):
    dataset_name, data_path, input_size, seed = args_tuple
    ds, _ = load_dataset(dataset_name, data_path, "train")
    tf = SegTrainTransform(base_size=int(input_size * 288 / 256),
                           crop_size=input_size)
    rng = np.random.default_rng(seed + 101 * worker_id)
    order = rng.permutation(len(ds))
    for i in order[worker_id::num_workers]:
        img, mask = ds[int(i)]
        yield tf(img, mask, rng)


def main(args) -> None:
    print(f"{args}".replace(", ", ",\n"))
    mesh = _common.build_mesh(args)
    policy = Policy()

    _, num_classes = load_dataset(args.dataset, args.data_path, "val",
                                  transforms=None) if args.data_path else (None, 21)

    if args.model_ckpt:
        model = _common.build_model(args.model, model_args=args.model_args,
                                    num_classes=args.pretrain_num_classes)
    else:
        model = _common.build_model(args.model, model_args=args.model_args,
                                    num_classes=num_classes)
    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    if args.model_ckpt:
        params = load_params(args.model_ckpt, model, params)
        model, params = model.replace_head(params, jax.random.key(args.seed + 2),
                                           num_classes)
        print(f"Loaded {args.model_ckpt}; heads swapped to {num_classes} classes")
    params = shard_params(params, mesh)

    encoder = _common.build_model(args.encoder, model_args=args.encoder_args)
    enc_params = shard_params(
        jax.jit(lambda k: encoder.init(k))(jax.random.key(args.seed + 1)), mesh)
    if args.encoder_ckpt:
        enc_params = load_params(args.encoder_ckpt, encoder, enc_params)
        print(f"Loaded encoder {args.encoder_ckpt}")
    enc_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, enc_params)
    enc_params = _common.maybe_quantize_encoder(
        enc_params, args.encoder_quantization)
    enc_policy = Policy(param_dtype=jnp.bfloat16)

    opt = adamw(weight_decay=args.weight_decay)
    state = TrainState.create(params, opt)
    start_epoch = args.start_epoch
    if args.resume:
        from tae_tpu.ckpt.io import load_train_state

        rp, opt_state, meta = load_train_state(args.resume, model, state.params,
                                                state.opt)
        state = TrainState(params=rp, opt=opt_state or state.opt)
        start_epoch = int(meta.get("step", start_epoch - 1)) + 1
        print(f"Resumed {args.resume} at epoch {start_epoch}")

    def encode(imgs):
        return jax.lax.stop_gradient(encoder.forward_encoder(
            enc_params, imgs, policy=enc_policy, backend=args.attn_backend))

    def loss_fn(p, batch):
        imgs, target = batch
        out = model.forward(p, encode(imgs), policy=policy,
                            backend=args.attn_backend, remat=args.remat,
                            mesh=mesh)
        return criterion(out, target), {}

    step = jax.jit(make_train_step(loss_fn, opt, epoch_step_lr(args.lr, 90, 0.1)),
                   donate_argnums=(0,))

    @jax.jit
    def predict(p, imgs):
        out = model.forward(p, encode(imgs), policy=policy,
                            backend=args.attn_backend, mesh=mesh)
        return jnp.argmax(out["out"], axis=1)

    data_shard = batch_sharding(mesh)
    mask_shard = batch_sharding(mesh)

    for epoch in range(start_epoch, args.epochs):
        make_iter = functools.partial(
            _train_iter, (args.dataset, args.data_path, args.input_size,
                          args.seed + epoch))
        loader = BatchLoader(make_iter, args.batch_size_per_gpu,
                             num_workers=args.workers, drop_last=True)
        logger = MetricLogger()
        # device-resident metric ring: one D2H per window, no per-iter
        # lockstep over the link (utils/meters.py:DeviceMetricRing)
        ring = DeviceMetricRing(("loss", "lr"), window=min(args.print_freq, 10))

        def on_metrics(pit, vals):
            logger.update(**vals)
            if pit % args.print_freq == 0:
                print(f"Epoch: [{epoch}] [{pit}] {logger}", flush=True)

        for it, (imgs, target) in enumerate(device_prefetch(
                loader, sharding=(data_shard, mask_shard))):
            state, metrics = step(state, (imgs, target), jnp.int32(epoch))
            ring.consume(ring.push(it, metrics,
                                   force=it % args.print_freq == 0),
                         on_metrics)
        ring.consume(ring.drain(), on_metrics)

        confmat = evaluate(predict, state.params, args, num_classes)
        print(confmat)

        save_checkpoint(Path(args.output_dir) / "checkpoint",
                        {"params": state.params, "opt": state.opt._asdict()},
                        step=epoch, args=asdict_args(args),
                        extra={"mean_iou": confmat.mean_iou})
        if is_main_process():
            append_jsonl(Path(args.output_dir) / "seg_log.txt",
                         {**{f"train_{k}": m.global_avg
                             for k, m in logger.meters.items()},
                          "mean_iou": confmat.mean_iou, "epoch": epoch})


def evaluate(predict, params, args, num_classes: int) -> ConfusionMatrix:
    ds, _ = load_dataset(args.dataset, args.data_path, "val",
                         transforms=SegEvalTransform(args.input_size))
    confmat = ConfusionMatrix(num_classes)
    bs = args.batch_size_per_gpu

    def val_iter(worker_id, num_workers):
        for i in range(len(ds)):
            yield ds[i]

    for imgs, target in BatchLoader(val_iter, bs):
        padded, n = _common.pad_batch(imgs, bs)
        pred = np.asarray(predict(params, jnp.asarray(padded)))[:n]
        confmat.update(np.asarray(target)[:n], pred)
    confmat.reduce_from_all_processes()
    return confmat


def cli_main() -> None:
    parser = get_args_parser()
    args = parser.parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
