"""Generate pycocotools golden fixtures for the mask-decode parity tests.

Run this on any machine WITH pycocotools installed:

    python scripts/gen_coco_goldens.py          # writes tests/fixtures/coco_mask_goldens.npz

and commit the resulting ``.npz``. ``tests/test_segmentation.py::
test_mask_goldens_fixture`` then asserts the numpy port
(tae_tpu/data/coco_seg.py) reproduces the stored pycocotools outputs
bit-for-bit wherever the fixture exists — including environments (like the
build rig) where pycocotools itself is absent. The case list is a fixed
seed, so regeneration is reproducible.

Until a pycocotools-equipped machine mints the fixture, the executable
parity evidence on this rig is the independent C++ cross-implementation
(native/maskapi.cpp, test_mask_decode_cross_implementation).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "coco_mask_goldens.npz"


def make_cases() -> list[list[float]]:
    """The deterministic polygon case list (shared with the cross-impl
    test's distribution: blobs, slivers, tiny triangles, zigzags)."""
    rng = np.random.default_rng(1234)
    cases: list[list[float]] = []
    for i in range(24):
        kind = i % 4
        if kind == 0:
            n = int(rng.integers(3, 14))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(2, 60, n)
            cx, cy = rng.uniform(20, 100, 2)
            cases.append([float(v) for p in zip(cx + rad * np.cos(ang),
                                                cy + rad * np.sin(ang))
                          for v in p])
        elif kind == 1:
            y0 = float(rng.uniform(0, 100))
            cases.append([0.3, y0, 120.3, y0 + 0.4, 120.5, y0 + 1.1, 0.1, y0 + 0.6])
        elif kind == 2:
            x0, y0 = (float(v) for v in rng.uniform(0, 100, 2))
            cases.append([x0, y0, x0 + 3.3, y0 + 0.2, x0 + 0.4, y0 + 2.9])
        else:
            cases.append([float(v) for p in rng.uniform(0, 120, (6, 2))
                          for v in p])
    return cases


def main() -> None:
    from pycocotools import mask as mask_util  # the point of this script

    h = w = 128
    cases = make_cases()
    polys_json = json.dumps(cases)
    masks = []
    for poly in cases:
        rle = mask_util.frPyObjects([poly], h, w)[0]
        masks.append(mask_util.decode(rle))
    # compressed-RLE round trip goldens on random masks
    rng = np.random.default_rng(99)
    rle_masks, rle_strings, rle_shapes = [], [], []
    for _ in range(8):
        hh, ww = (int(v) for v in rng.integers(10, 100, 2))
        m = (rng.random((hh, ww)) < 0.35).astype(np.uint8)
        enc = mask_util.encode(np.asfortranarray(m))
        rle_masks.append(m)
        rle_strings.append(enc["counts"].decode())
        rle_shapes.append((hh, ww))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        OUT,
        polys_json=np.frombuffer(polys_json.encode(), np.uint8),
        poly_masks=np.stack(masks),
        size=np.asarray([h, w]),
        rle_strings_json=np.frombuffer(
            json.dumps(rle_strings).encode(), np.uint8),
        rle_shapes=np.asarray(rle_shapes),
        **{f"rle_mask_{i}": m for i, m in enumerate(rle_masks)},
    )
    print(f"wrote {OUT} ({len(cases)} polygons, {len(rle_masks)} RLEs)")


if __name__ == "__main__":
    main()
