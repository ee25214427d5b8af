"""Analytic go/no-go for the spectral convergence corpus (r3 session 9).

Before spending chip-hours on the vocab-width sweep, verify that the
corpus actually makes bottleneck width matter: compute the optimal
*linear* per-patch coding floor — PCA residual energy beyond the top-v
components of the 16x16x3 patch covariance, in ImageNet-normalized space
(the space eval MSE is measured in, reference train.py:203-223) — for
v = 16/64/256, through the full JPEG round trip.

If MSE_floor(16) >> MSE_floor(64) >> MSE_floor(256), a width-v TAE has
headroom to separate at short horizons (the model can only do better than
this bound by exploiting cross-patch context; the ordering direction is
the claim being tested). The structured corpus fails this probe — that is
why the first sweep attempt didn't separate (docs/CONVERGENCE.md).

    python scripts/spectral_floor_probe.py --alphas 0.75 1.0 1.25
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def patches_from(img: np.ndarray, p: int = 16) -> np.ndarray:
    """(H, W, 3) uint8 -> (N, p*p*3) float32 in normalized space, channel-
    major per patch (the model's patchify order, tae_tpu/ops/patchify.py)."""
    x = (img.astype(np.float32) / 255.0 - MEAN) / STD
    h, w, _ = x.shape
    gh, gw = h // p, w // p
    x = x[: gh * p, : gw * p]
    x = x.reshape(gh, p, gw, p, 3).transpose(0, 2, 4, 1, 3)  # gh gw c p p
    return x.reshape(gh * gw, 3 * p * p)


def floors(gen, n_images: int, p: int = 16, jpeg_q: int | None = 95
           ) -> dict[int, float]:
    from PIL import Image

    pats = []
    for _ in range(n_images):
        img = gen()
        if jpeg_q is not None:
            buf = io.BytesIO()
            Image.fromarray(img, "RGB").save(buf, format="JPEG",
                                             quality=jpeg_q)
            img = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
        pats.append(patches_from(img, p))
    z = np.concatenate(pats, axis=0)
    z -= z.mean(axis=0, keepdims=True)
    cov = (z.T @ z) / len(z)
    ev = np.linalg.eigvalsh(cov)[::-1]          # descending
    total = ev.sum()
    out = {}
    for v in (16, 64, 256):
        # per-element MSE floor = residual energy / patch dim
        out[v] = float(ev[v:].sum() / z.shape[1])
    out["var"] = float(total / z.shape[1])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--alphas", type=float, nargs="+", default=[1.0])
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from tae_tpu.data.fake import _spectral_image, _structured_image

    rng = np.random.default_rng(0)
    print("corpus                |  var/elem | floor v=16 | v=64 | v=256 "
          "| ratios 16/64, 64/256")
    rows = [("structured (current)",
             lambda: _structured_image(rng, args.size))]
    for a in args.alphas:
        rows.append((f"spectral alpha={a}",
                     lambda a=a: _spectral_image(rng, args.size, a)))
    for name, gen in rows:
        f = floors(gen, args.images)
        r1 = f[16] / max(f[64], 1e-12)
        r2 = f[64] / max(f[256], 1e-12)
        print(f"{name:21s} | {f['var']:9.4f} | {f[16]:10.5f} | {f[64]:.5f} "
              f"| {f[256]:.5f} | {r1:.1f}x, {r2:.1f}x")


if __name__ == "__main__":
    main()
