"""Latent-classifier pretraining on ImageNet-19k-style webdataset streams.

Counterpart of reference recognition/train_recognition_in19k.py: a frozen
TAE encoder feeds latents to a VITForRecognition classifier; iteration-based
infinite stream, plain CE, acc1/acc5 train metrics, unconditional periodic
checkpointing + JSONL logs (reference :102-168).

TPU-native topology: the reference runs a manual 2-GPU pipeline (encoder on
cuda:0 -> D2D copy -> classifier on cuda:1, reference :58-59,110-117). Here
both live in one jitted SPMD program — the frozen encoder runs under
``stop_gradient`` and XLA overlaps/fuses the stages; on a mesh the same
program shards over (data, fsdp, tensor) with no explicit copies.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from tae_tpu.ckpt.io import asdict_args, load_params, save_checkpoint
from tae_tpu.cli import _common
from tae_tpu.data.loader import device_prefetch
from tae_tpu.parallel import batch_sharding, is_main_process, shard_params
from tae_tpu.train import TrainState, adamw, make_train_step, step_lr
from tae_tpu.train.losses import cross_entropy, topk_accuracy
from tae_tpu.utils.dtypes import Policy
from tae_tpu.utils.meters import DeviceMetricRing, MetricLogger, append_jsonl


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("Downstream recognition pretraining (no eval)",
                                add_help=False)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--save_prefix", default="", type=str)
    p.add_argument("--save_freq", default=10000, type=int)
    p.add_argument("--model", default="", type=str)
    p.add_argument("--model_ckpt", default="", type=str)
    p.add_argument("--num_classes", default=None, type=int)
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--encoder", default="", type=str)
    p.add_argument("--encoder_ckpt", default="", type=str)
    p.add_argument("--encoder_args", default="", type=str,
                   help="JSON overrides for the encoder factory")
    p.add_argument("--encoder_equalize", type=float, default=0.0,
                   help="SmoothQuant-style equalization alpha applied "
                        "before --encoder_quantization (0 = off)")
    p.add_argument("--encoder_quantization", default=None, choices=["int8"],
                   help="run the frozen encoder in the int8 w8a8 serving "
                        "layout (latent rel err ~3e-2 vs bf16)")
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--max_lr", type=float, default=1e-4)
    p.add_argument("--min_lr", type=float, default=1e-5)
    p.add_argument("--switch_it", type=int, default=900000)
    p.add_argument("--num_its", type=int, default=1000001)
    p.add_argument("--train_data_path", default="", type=str)
    p.add_argument("--latents_path", default="", type=str,
                   help="train from pre-encoded latents instead of "
                        "images+frozen encoder: encode CLI output dir/index, "
                        "or a reference-format {latents,targets} .pth dump")
    p.add_argument("--num_workers", default=16, type=int)
    p.add_argument("--device_normalize", action="store_true",
                   help="ship uint8 pixels and normalize on device (4x "
                        "smaller H2D copies; needs the native decoder)")
    p.add_argument("--output_dir", default="./output_dir")
    p.add_argument("--log_freq", default=50, type=int)
    _common.add_tpu_args(p)
    return p


def _latent_iter(path: str, seed: int, worker_id: int, num_workers: int):
    from tae_tpu.data.latents import LatentDataset

    ds = LatentDataset(path)
    yield from ds.iter_samples(worker_id, num_workers, loop=True,
                               seed=seed + worker_id)


def main(args) -> None:
    print(f"{args}".replace(", ", ",\n"))
    mesh = _common.build_mesh(args)
    policy = Policy()

    model = _common.build_model(args.model, model_args=args.model_args,
                                num_classes=args.num_classes)
    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    params = shard_params(params, mesh)
    print(f"Model: {args.model}; params (M): "
          f"{sum(x.size for x in jax.tree.leaves(params)) / 1e6}")

    from_latents = bool(args.latents_path)
    if not from_latents:
        encoder = _common.build_model(args.encoder, model_args=args.encoder_args)
        enc_params = jax.jit(lambda k: encoder.init(k))(
            jax.random.key(args.seed + 1))
        enc_params = shard_params(enc_params, mesh)
        print(f"Encoder: {args.encoder}; params (M): "
              f"{sum(x.size for x in jax.tree.leaves(enc_params)) / 1e6}")
        if args.encoder_ckpt:
            enc_params = load_params(args.encoder_ckpt, encoder, enc_params)
            print(f"Loaded encoder {args.encoder_ckpt}")
        # frozen-encoder inference cast once to bf16 (no grads flow into it)
        enc_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, enc_params)
        # the frozen stage only ever runs forward_encoder — drop the decoder
        # half before (optionally) quantizing: ~half the resident
        # encoder-side weight HBM on the 3.4-4B configs (same rewrite as
        # the encode CLI)
        from tae_tpu.tokenizer import prune_component

        enc_params = prune_component(enc_params, "encoder")
        enc_params = _common.maybe_quantize_encoder(
            enc_params, args.encoder_quantization, args.encoder_equalize)

    opt = adamw(weight_decay=args.weight_decay)
    state = TrainState.create(params, opt)
    if args.model_ckpt:
        from tae_tpu.ckpt.io import load_train_state

        params, opt_state, _ = load_train_state(args.model_ckpt, model, params,
                                                state.opt)
        state = TrainState(params=params, opt=opt_state or state.opt)
        print(f"Resumed classifier {args.model_ckpt}"
              + (" with optimizer state" if opt_state is not None else ""))

    enc_policy = Policy(param_dtype=jnp.bfloat16)

    from tae_tpu.data.transforms import maybe_device_normalize

    def loss_fn(p, batch):
        x, targets = batch
        if from_latents:
            z = x
        else:
            # uint8 batches (--device_normalize) normalize on device, same
            # fusion as cli/train.py — the elementwise op rides the frozen
            # encoder's patch-embed read
            x = maybe_device_normalize(x, encoder.cfg.patch_size, jnp.float32)
            z = jax.lax.stop_gradient(encoder.forward_encoder(
                enc_params, x, policy=enc_policy, backend=args.attn_backend))
        logits = model.forward(p, z, policy=policy, backend=args.attn_backend,
                               remat=args.remat)
        loss = cross_entropy(logits, targets)
        return loss, topk_accuracy(logits, targets)

    step = jax.jit(
        make_train_step(loss_fn, opt,
                        step_lr(args.max_lr, args.min_lr, args.switch_it),
                        accum_iter=args.accum_iter),
        donate_argnums=(0,))

    if from_latents:
        import functools

        from tae_tpu.data.loader import BatchLoader

        make_iter = functools.partial(_latent_iter, args.latents_path, args.seed)
        loader = BatchLoader(make_iter, args.batch_size * args.accum_iter,
                             num_workers=args.num_workers, drop_last=True)
        data_shard = batch_sharding(mesh)
    else:
        loader = _common.wds_train_loader(args, args.batch_size * args.accum_iter)
        data_shard = batch_sharding(mesh)
    target_shard = batch_sharding(mesh)

    def batches():
        for imgs, targets in loader:
            yield imgs, targets

    metric_logger = MetricLogger()
    # device-resident metric ring: one D2H transfer per window instead of
    # a per-iter device_get lockstep (utils/meters.py:DeviceMetricRing)
    ring = DeviceMetricRing(("loss", "acc1", "acc5"),
                            window=min(args.log_freq, 10))

    def on_metrics(pit, vals):
        metric_logger.update(loss=vals["loss"])
        metric_logger.update(n=args.batch_size, acc1=vals["acc1"],
                             acc5=vals["acc5"])
        if pit % args.log_freq == 0:
            print(f"it {pit}: {metric_logger}", flush=True)

    print("Starting training!")
    for it, (imgs, targets) in enumerate(device_prefetch(
            batches(), sharding=(data_shard, target_shard))):
        if it == args.num_its:
            break
        state, metrics = step(state, (imgs, targets), jnp.int32(it))

        force = (it % args.log_freq == 0 or it % args.save_freq == 0
                 or it == args.num_its - 1)
        ring.consume(ring.push(it, metrics, force=force), on_metrics)

        if it != 0 and it % args.save_freq == 0:
            print(f"Iteration {it}")
            save_checkpoint(
                Path(args.output_dir) / f"{args.save_prefix}_{args.model}_checkpoint",
                {"params": state.params, "opt": state.opt._asdict()},
                step=it, args=asdict_args(args))
            metric_logger.synchronize_between_processes()
            log_stats = {**{f"train_{k}": m.global_avg
                            for k, m in metric_logger.meters.items()},
                         "iteration": it}
            if is_main_process():
                append_jsonl(Path(args.output_dir) /
                             f"{args.save_prefix}_{args.model}_log.txt", log_stats)
            metric_logger = MetricLogger()

    # rows buffered when the data iterator ends before num_its
    ring.consume(ring.drain(), on_metrics)


def cli_main() -> None:
    parser = get_args_parser()
    args = parser.parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
