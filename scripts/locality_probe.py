"""Does a latent at patch i still know patch i's color? (CPU diagnostic)

The seg-on-frozen-latents runs generalize at background-only mIoU while the
recognition trainer hits 96% acc1 through the SAME frozen random encoder.
Classification needs only globally-pooled information; dense prediction
needs per-patch locality. This probe quantifies locality directly: ridge-
regress per-patch mean RGB from the frozen encoder's latents, train on a
few images, test held-out. High R^2 = locality survives the random
encoder; R^2 ~ 0 = the depth-24 random attention mixing + 16-dim
bottleneck destroys it (and seg-from-random-encoder cannot generalize,
matching the observed plateau).

Usage: python scripts/locality_probe.py [depth ...]   (default: full, 2)
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tae_tpu import models  # noqa: E402
from tae_tpu.ops.patchify import extract_patches  # noqa: E402
from tae_tpu.utils.dtypes import Policy  # noqa: E402


def latents_and_colors(depth_override: int | None, imgs: np.ndarray):
    kw = {}
    if depth_override is not None:
        kw = {"embed_dim": 256, "depth": depth_override, "num_heads": 4,
              "decoder_embed_dim": 256, "decoder_depth": 2,
              "decoder_num_heads": 4}
    model = models.create("tae_patch16_vocab16_px256", **kw)
    params = jax.jit(lambda k: model.init(k, dtype=jnp.bfloat16))(
        jax.random.key(1))
    policy = Policy(param_dtype=jnp.bfloat16)
    z = jax.jit(lambda p, x: model.forward_encoder(p, x, policy=policy))(
        params, jnp.asarray(imgs, jnp.bfloat16))
    # per-patch mean RGB targets, same row-major token order as the
    # encoder's patch embed (extract_patches flattens channel-major (C,p,p))
    pp = extract_patches(jnp.asarray(imgs), 16)  # (B, N, C*p*p)
    color = pp.reshape(*pp.shape[:2], 3, -1).mean(-1)
    return np.asarray(z, np.float64), np.asarray(color, np.float64)


def ridge_r2(z: np.ndarray, y: np.ndarray, n_train: int) -> float:
    zt, yt = z[:n_train].reshape(-1, z.shape[-1]), y[:n_train].reshape(-1, 3)
    zv, yv = z[n_train:].reshape(-1, z.shape[-1]), y[n_train:].reshape(-1, 3)
    zm, ym = zt.mean(0), yt.mean(0)
    a = zt - zm
    w = np.linalg.solve(a.T @ a + 1e-3 * np.eye(a.shape[1]), a.T @ (yt - ym))
    resid = ((zv - zm) @ w + ym - yv)
    return 1.0 - (resid ** 2).sum() / ((yv - yv.mean(0)) ** 2).sum()


def main() -> None:
    depths = sys.argv[1:] or ["full", "2"]
    rng = np.random.default_rng(0)
    # color-blob images in the fixture's spirit: per-image random blocks
    imgs = rng.uniform(0, 1, (8, 3, 4, 4)).repeat(64, 2).repeat(64, 3)
    imgs = (imgs - 0.45) / 0.225
    for d in depths:
        dd = None if d == "full" else int(d)
        z, color = latents_and_colors(dd, imgs.astype(np.float32))
        r2 = ridge_r2(z, color, n_train=6)
        print(f"depth={d}: latent (., {z.shape[-1]}), held-out patch-color "
              f"R^2 = {r2:.3f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
