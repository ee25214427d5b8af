"""Synthetic data fixtures: fake webdataset shards and ImageFolder trees.

The reference tests only against real ImageNet shards on a cluster
(reference tests/test_wds.py); these generators give the test suite and
benchmarks hermetic inputs with the same on-disk formats.
"""

from __future__ import annotations

import io
import tarfile
from pathlib import Path

import numpy as np


def _random_jpeg(rng: np.random.Generator, size: int, quality: int = 90) -> bytes:
    from PIL import Image

    arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def make_fake_wds_shard(path: str | Path, num_samples: int = 32, size: int = 64,
                        num_classes: int = 10, seed: int = 0) -> Path:
    """Write a ``{key}.jpg`` + ``{key}.cls`` tar shard (webdataset layout)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(num_samples):
            key = f"{i:06d}"
            jpg = _random_jpeg(rng, size)
            cls = str(int(rng.integers(0, num_classes))).encode()
            for ext, data in (("jpg", jpg), ("cls", cls)):
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return path


def make_fake_imagefolder(root: str | Path, num_classes: int = 3,
                          per_class: int = 4, size: int = 64,
                          seed: int = 0) -> Path:
    from PIL import Image

    root = Path(root)
    rng = np.random.default_rng(seed)
    for c in range(num_classes):
        d = root / f"class_{c:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"img_{i:04d}.jpg", quality=95)
    return root


def make_fake_coco(root: str | Path, n_train: int = 8, n_val: int = 4,
                   size: int = 64, seed: int = 0) -> Path:
    """Minimal COCO instances layout with polygon annotations in VOC
    categories (rectangles, area > the reference's 1000px train filter)."""
    import json

    from PIL import Image

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        (root / split).mkdir(parents=True, exist_ok=True)
        images, annotations = [], []
        ann_id = 1
        for i in range(n):
            name = f"{i:012d}.jpg"
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(root / split / name, quality=90)
            images.append({"id": i + 1, "file_name": name,
                           "height": size, "width": size})
            # one big rectangle (valid) + occasionally a tiny one (filtered)
            x0, y0 = int(rng.integers(0, size // 3)), int(rng.integers(0, size // 3))
            w = h = size // 2
            cat = int(rng.choice([1, 5, 2, 16, 9]))  # VOC-mapped categories
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cat,
                "segmentation": [[x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h]],
                "area": float(w * h), "iscrowd": 0,
                "bbox": [x0, y0, w, h]})
            ann_id += 1
        (root / "annotations").mkdir(parents=True, exist_ok=True)
        (root / "annotations" / f"instances_{split}.json").write_text(json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": c, "name": str(c)} for c in range(1, 91)]}))
    return root
