"""Quantization accuracy on TRAINED weights (VERDICT r2 item 6).

The int8/int4 latent-error numbers in docs/KERNELS.md were measured on
random-init weights; this script pins them to data from an actually-trained
checkpoint (the docs/CONVERGENCE.md run). For each serving mode it reports

  - latent relative error vs the bf16 encoder on the same images,
  - reconstruction eval MSE (mean of per-batch means, the reference's
    evaluate.py:84-102 metric) with BOTH encode and decode quantized,
  - the MSE delta vs bf16 serving.

Modes: bf16, int8, int8+equalize, int4, int4+equalize, int4+equalize+calib
(ln_amax activation calibration on held-out val batches).

Run ON-CHIP (the int8/int4 paths are Pallas-only). All metrics are computed
on-device and fetched as scalars — D2H of big arrays is KB/s-slow over the
relay (CLAUDE.md).

    python scripts/quant_accuracy.py \
        --model tae_patch16_vocab16_px256 \
        --ckpt /root/repo/.convergence/out/conv_checkpoint \
        --val_data_path /root/repo/.convergence/data/val

Prints one markdown table (for docs/KERNELS.md) and one JSON line.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.cli import _common
from tae_tpu.tokenizer import Tokenizer


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("quantization accuracy on trained weights")
    p.add_argument("--model", default="tae_patch16_vocab16_px256")
    p.add_argument("--ckpt", default="/root/repo/.convergence/out/conv_checkpoint")
    p.add_argument("--val_data_path", default="/root/repo/.convergence/data/val")
    p.add_argument("--input_size", default=256, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--num_batches", default=4, type=int,
                   help="eval batches per mode (first N of the val loader)")
    p.add_argument("--calib_batches", default=2, type=int,
                   help="extra val batches fed to ln_amax calibration")
    p.add_argument("--modes", default="bf16,int8,int8+eq,int4,int4+eq,"
                   "int4+eq+calib", help="comma list; bf16 always runs first")
    p.add_argument("--model_args", default="", type=str,
                   help='JSON cfg overrides, e.g. \'{"depth": 2}\'')
    p.add_argument("--platform", default="",
                   help="force a jax platform (the axon plugin overrides the "
                        "JAX_PLATFORMS env; 'cpu' here makes CPU smokes safe "
                        "while the chip is busy)")
    return p


def load_batches(args) -> list[np.ndarray]:
    loader = _common.imagefolder_val_loader(
        args.val_data_path, args.input_size, args.batch_size, num_workers=2)
    want = args.num_batches + args.calib_batches
    batches = []
    for imgs, _ in loader:
        if imgs.shape[0] == args.batch_size:  # keep shapes static: 1 compile
            batches.append(np.asarray(imgs))
        if len(batches) == want:
            break
    if len(batches) < want:
        raise SystemExit(f"val set too small: got {len(batches)} full "
                         f"batches, need {want}")
    return batches


def make_steps(tok: Tokenizer):
    """Jitted per-batch metric steps: encode, decode to patch space (the
    metric space, reference evaluate.py:92-96), compare on-device — only
    scalars cross the relay. `ref_step` additionally returns the fp32
    latents (kept device-resident as the comparison baseline)."""
    model, pol = tok.model, tok.policy

    def fwd(p, imgs):
        z = model.forward_encoder(p, imgs, policy=pol)
        pred = model.forward_decoder(p, z, policy=pol).astype(jnp.float32)
        target = model.patchify(imgs).astype(jnp.float32)
        return z.astype(jnp.float32), jnp.mean(jnp.square(pred - target))

    @jax.jit
    def ref_step(p, imgs):
        return fwd(p, imgs)

    @jax.jit
    def step(p, imgs, ref_z):
        z32, mse = fwd(p, imgs)
        rel = jnp.linalg.norm(z32 - ref_z) / jnp.maximum(
            jnp.linalg.norm(ref_z), 1e-12)
        return rel, mse

    return ref_step, step


def main() -> None:
    args = get_args_parser().parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    batches = load_batches(args)
    eval_batches = [jnp.asarray(b) for b in batches[:args.num_batches]]
    calib = batches[args.num_batches:]

    all_modes = {
        "bf16": dict(),
        "int8": dict(quantization="int8"),
        "int8+eq": dict(quantization="int8", equalize=0.5),
        "int4": dict(quantization="int4"),
        "int4+eq": dict(quantization="int4", equalize=0.5),
        "int4+eq+calib": dict(quantization="int4", equalize=0.5,
                              calib_images=calib),
    }
    wanted = [m.strip() for m in args.modes.split(",") if m.strip()]
    # the bf16 baseline must run FIRST (it produces ref_latents + base MSE)
    wanted = ["bf16"] + [m for m in wanted if m != "bf16"]
    modes = [(m, all_modes[m]) for m in wanted]
    overrides = json.loads(args.model_args) if args.model_args else {}

    results: dict[str, dict] = {}
    ref_latents: list[jax.Array] = []  # device-resident bf16-mode latents
    base_mse = None
    for name, kw in modes:
        tok = Tokenizer.from_checkpoint(args.model, args.ckpt or None,
                                        **kw, **overrides)
        ref_step, step = make_steps(tok)
        rels, mses = [], []
        for i, imgs in enumerate(eval_batches):
            if name == "bf16":
                z32, mse = ref_step(tok.params, imgs)
                ref_latents.append(z32)
            else:
                rel, mse = step(tok.params, imgs, ref_latents[i])
                rels.append(float(rel))
            mses.append(float(mse))
        r = {"rel_err": float(np.mean(rels)) if rels else 0.0,
             "mse": float(np.mean(mses))}
        if base_mse is None:
            base_mse = r["mse"]
        r["mse_delta_pct"] = 100.0 * (r["mse"] - base_mse) / base_mse
        results[name] = r
        print(f"[{name}] latent rel err {r['rel_err']:.4g}  "
              f"recon MSE {r['mse']:.6f}  ({r['mse_delta_pct']:+.2f}% vs bf16)",
              flush=True)
        del tok, ref_step, step

    print("\n| mode | latent rel err vs bf16 | recon MSE | MSE vs bf16 |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['rel_err']:.3g} | {r['mse']:.5f} | "
              f"{r['mse_delta_pct']:+.2f}% |")
    print(json.dumps({"model": args.model, "ckpt": args.ckpt,
                      "images": args.batch_size * args.num_batches,
                      "results": results}))
    print("DONE")


if __name__ == "__main__":
    main()
