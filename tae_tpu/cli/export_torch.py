"""Export a tae_tpu checkpoint as a PyTorch reference ``.pth`` file.

Superset utility (no reference counterpart): checkpoints trained with this
framework load into the reference model classes with ``strict=True``
(reference ``tae.__dict__[name]().load_state_dict(ckpt["model"])``,
train.py:94 + util/misc.py:307-317), so latents/decoders trained on TPU can
be handed back to PyTorch consumers.

    python -m tae_tpu.cli.export_torch \
        --model tae_patch16_vocab16_px256 \
        --resume outputs/run/conv_checkpoint --output tae_p16v16.pth
"""

from __future__ import annotations

import argparse

import jax

from tae_tpu.ckpt.io import load_params
from tae_tpu.ckpt.torch_export import save_torch_checkpoint
from tae_tpu.cli import _common


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("tae_tpu -> torch checkpoint export",
                                add_help=False)
    p.add_argument("--model", required=True, type=str)
    p.add_argument("--resume", required=True,
                   help="tae_tpu checkpoint dir (or reference .pth) to read")
    p.add_argument("--output", required=True, help="output .pth path")
    p.add_argument("--num_classes", default=None, type=int,
                   help="for recognition/segmentation models")
    _common.add_tpu_args(p)
    return p


def main(args) -> None:
    kwargs = {}
    if args.num_classes is not None:
        kwargs["num_classes"] = args.num_classes
    model = _common.build_model(args.model, model_args=args.model_args,
                                **kwargs)
    params = jax.jit(lambda k: model.init(k))(jax.random.key(args.seed))
    params = load_params(args.resume, model, params)
    save_torch_checkpoint(args.output, model, params)
    print(f"Exported {args.model} from {args.resume} -> {args.output}")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
