"""Native pipeline tests: builds (or uses) libtaedata.so, compares the fused
decode+resample path against the PIL reference implementations."""

import io
import subprocess
from pathlib import Path

import numpy as np
import pytest

from tae_tpu.data import native
from tae_tpu.data.transforms import center_crop_transform, normalize, to_array

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not (REPO / "tae_tpu/data/libtaedata.so").exists():
        try:
            subprocess.run([str(REPO / "native/build.sh")], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"cannot build native lib: {e}")
    if not native.available():
        pytest.skip("native lib unavailable")


def _jpeg_bytes(arr: np.ndarray, quality: int = 95) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(0)
    # smooth-ish image so JPEG decode differences stay tiny
    base = rng.integers(30, 220, (12, 16, 3)).astype(np.uint8)
    from PIL import Image

    big = Image.fromarray(base, "RGB").resize((160, 120),
                                              Image.Resampling.BILINEAR)
    arr = np.asarray(big)
    return arr, _jpeg_bytes(arr)


def test_jpeg_size(sample):
    _, data = sample
    assert native.jpeg_size(data) == (160, 120)


def test_decode_matches_pil_resample(sample):
    """Fused native decode+box-resize+normalize vs PIL decode + resize(box=)
    + normalize. Same libjpeg underneath; resampling is float vs PIL
    fixed-point, so allow small per-pixel slack."""
    from PIL import Image

    arr, data = sample
    box = (8.0, 4.0, 130.0, 100.0)
    out = native.decode_to_tensor(data, box, 64, filter=native.BICUBIC)

    pil = Image.open(io.BytesIO(data)).convert("RGB")
    ref = pil.resize((64, 64), Image.Resampling.BICUBIC, box=box)
    ref = normalize(to_array(ref))
    assert out.shape == (3, 64, 64)
    # normalized units; 0.02 ~= 1 of 255 levels
    assert np.abs(out - ref).mean() < 0.02
    assert np.abs(out - ref).max() < 0.25


def test_hflip(sample):
    _, data = sample
    a = native.decode_to_tensor(data, (0, 0, 160, 120), 32, hflip=False)
    b = native.decode_to_tensor(data, (0, 0, 160, 120), 32, hflip=True)
    np.testing.assert_allclose(a, b[:, :, ::-1], atol=1e-6)


def test_center_crop_matches_pil(sample):
    arr, data = sample
    out = native.center_crop(data, 64, pad=32)
    ref = center_crop_transform(64, pad=32)(
        __import__("PIL.Image", fromlist=["Image"]).open(io.BytesIO(data)).convert("RGB"))
    assert out.shape == ref.shape == (3, 64, 64)
    # box-equivalent formulation vs two-step resize+crop: small drift allowed
    assert np.abs(out - ref).mean() < 0.06


def test_random_resized_crop_native(sample):
    _, data = sample
    rng = np.random.default_rng(1)
    out = native.random_resized_crop(data, rng, 48)
    assert out.shape == (3, 48, 48) and out.dtype == np.float32
    assert np.isfinite(out).all()


def test_batch_decode(sample):
    _, data = sample
    datas = [data] * 5
    boxes = np.tile(np.asarray([0, 0, 160, 120], np.float32), (5, 1))
    flips = np.zeros(5, np.int32)
    out = native.decode_batch(datas, boxes, flips, 32, threads=2)
    assert out.shape == (5, 3, 32, 32)
    single = native.decode_to_tensor(data, (0, 0, 160, 120), 32)
    np.testing.assert_allclose(out[3], single, atol=1e-6)


def test_scaled_decode_path(sample):
    """Large source box triggers DCT-domain downscaling; result should still
    approximate the full-resolution downsample."""
    arr, data = sample
    out = native.decode_to_tensor(data, (0, 0, 160, 120), 16)
    full = native.decode_to_tensor(data, (0, 0, 160, 120), 64)
    # compare 16px native (possibly scaled decode) vs 64->16 mean-pool proxy
    proxy = full.reshape(3, 16, 4, 16, 4).mean(axis=(2, 4))
    assert np.abs(out - proxy).mean() < 0.2
