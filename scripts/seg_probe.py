"""CPU diagnostic probe for the segmentation-on-frozen-latents plateau.

The on-chip downstream seg runs (reference regime: AdamW lr 0.01, frozen
random-init TAE encoder, reference segmentation/train.py:150-151) plateau at
mIoU ~5-6 on the color-coded structured COCO fixture while the recognition
trainer reaches 96% acc1 under the same frozen encoder. Two competing
hypotheses:

  H1 (regime):   AdamW lr=0.01 without warmup diverges/oscillates the seg ViT.
  H2 (encoder):  a deep *random-init* frozen encoder destroys per-token
                 locality (random attention mixing), so the 16-dim latents no
                 longer carry patch-local color — classification (global
                 pooling) survives this, dense prediction cannot.

Experiments (all tiny models, CPU, single jitted step each):
  control  — latents := per-patch mean RGB (row-major grid, padded to 16
             dims). Overfit one batch. Tests the seg head + unpatchify
             geometry with perfectly local latents.
  enc2     — latents from a frozen random 2-block tiny TAE encoder.
  enc12    — same but 12 blocks (locality-destruction depth test).
  lr       — enc2 at lr 0.01 vs 1e-3 (overfit, H1 test).

Usage: python scripts/seg_probe.py /root/repo/.convergence/coco
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tae_tpu import models  # noqa: E402
from tae_tpu.cli.train_segmentation import criterion  # noqa: E402
from tae_tpu.data.coco_seg import load_dataset  # noqa: E402
from tae_tpu.data.seg_transforms import SegEvalTransform  # noqa: E402
from tae_tpu.train import TrainState, adamw, make_train_step  # noqa: E402
from tae_tpu.utils.confusion import ConfusionMatrix  # noqa: E402

PATCH = 16
GRID = 256 // PATCH


def batch_from_fixture(root: str, n: int = 8):
    ds, num_classes = load_dataset("coco", root, "train")
    tf = SegEvalTransform(base_size=256)
    imgs, masks = [], []
    for i in range(n):
        img, mask = ds[i]
        a, m = tf(img, mask)
        imgs.append(a)
        masks.append(m)
    return (jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(masks))), num_classes


def control_latents(imgs: jnp.ndarray) -> jnp.ndarray:
    """Per-patch mean RGB in the row-major token order unpatchify expects
    (tae_tpu/ops/patchify.py), zero-padded to vocab=16 channels."""
    b = imgs.shape[0]
    x = imgs.reshape(b, 3, GRID, PATCH, GRID, PATCH).mean(axis=(3, 5))
    x = x.reshape(b, 3, GRID * GRID).transpose(0, 2, 1)  # (B, N, 3)
    return jnp.pad(x, ((0, 0), (0, 0), (0, 13)))


def make_encoder(depth: int):
    enc = models.create("tae_patch16_vocab16_px256", embed_dim=128, depth=depth,
                        num_heads=2, decoder_embed_dim=128, decoder_depth=1,
                        decoder_num_heads=2)
    params = jax.jit(enc.init)(jax.random.key(1))
    return enc, params


def run(name: str, latent_fn, batch, num_classes: int, lr: float,
        steps: int = 300) -> None:
    imgs, target = batch
    model = models.create("vit_segmentation_numpatches256_vocab16_base",
                          num_classes=num_classes, decoder_embed_dim=128,
                          decoder_depth=2, decoder_num_heads=2)
    params = jax.jit(model.init)(jax.random.key(0))
    z = jax.lax.stop_gradient(latent_fn(imgs))

    def loss_fn(p, b):
        zz, tt = b
        return criterion(model.forward(p, zz), tt), {}

    opt = adamw(weight_decay=1e-4)
    step = jax.jit(make_train_step(loss_fn, opt, lambda it: jnp.float32(lr)),
                   donate_argnums=(0,))
    state = TrainState.create(params, opt)
    t0 = time.time()
    losses = []
    for it in range(steps):
        state, metrics = step(state, (z, target), jnp.int32(0))
        if it % 50 == 0 or it == steps - 1:
            losses.append(float(metrics["loss"]))
    pred = jnp.argmax(model.forward(state.params, z)["out"], axis=1)
    cm = ConfusionMatrix(num_classes)
    cm.update(target, pred)
    acc_global, _, iou = cm.compute()
    print(f"[{name}] lr={lr} steps={steps} loss {losses[0]:.3f}->{losses[-1]:.3f} "
          f"global_acc {acc_global:.3f} mIoU {np.nanmean(iou):.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.convergence/coco"
    batch, num_classes = batch_from_fixture(root)
    print(f"batch {batch[0].shape} classes {num_classes}", flush=True)

    run("control", control_latents, batch, num_classes, lr=1e-3)

    enc2, p2 = make_encoder(depth=2)
    enc2_fn = jax.jit(lambda x: enc2.forward_encoder(p2, x))
    run("enc2", enc2_fn, batch, num_classes, lr=1e-3)

    enc12, p12 = make_encoder(depth=12)
    enc12_fn = jax.jit(lambda x: enc12.forward_encoder(p12, x))
    run("enc12", enc12_fn, batch, num_classes, lr=1e-3)

    run("lr0.01-enc2", enc2_fn, batch, num_classes, lr=1e-2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
