"""Recognition stack tests: losses vs torch, mixup/cutmix, randaugment,
and both recognition CLI drivers end-to-end on fake data."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tae_tpu.data.fake import make_fake_imagefolder, make_fake_wds_shard
from tae_tpu.data.mixup import cutmix, mixup, mixup_cutmix_collate
from tae_tpu.data.randaugment import rand_augment
from tae_tpu.train.losses import cross_entropy, topk_accuracy

ENC_ARGS = json.dumps(dict(img_size=64, embed_dim=64, depth=2, num_heads=4,
                           decoder_embed_dim=64, decoder_depth=2,
                           decoder_num_heads=4))
CLS_ARGS = json.dumps(dict(vocab_size=16, decoder_embed_dim=48,
                           decoder_depth=2, decoder_num_heads=4))


def test_cross_entropy_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 11)).astype(np.float32)
    targets = rng.integers(0, 11, 6)
    for smoothing in (0.0, 0.1):
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                   label_smoothing=smoothing))
        theirs = float(torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(targets),
            label_smoothing=smoothing))
        assert ours == pytest.approx(theirs, rel=1e-5)
    # soft targets
    soft = rng.dirichlet(np.ones(11), 6).astype(np.float32)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(soft)))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.05, 0.1], [0.1, 0.2, 0.7]])
    targets = jnp.asarray([1, 2, 2])
    acc = topk_accuracy(logits, targets, ks=(1, 2))
    assert float(acc["acc1"]) == pytest.approx(100 * 2 / 3)
    assert float(acc["acc2"]) == pytest.approx(100.0)


def test_mixup_cutmix_soft_targets():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    targets = np.asarray([0, 1, 2, 3])
    mi, my = mixup(imgs, targets, 5, alpha=0.2, rng=rng)
    assert mi.shape == imgs.shape and my.shape == (4, 5)
    np.testing.assert_allclose(my.sum(axis=1), 1.0, atol=1e-6)
    ci, cy = cutmix(imgs, targets, 5, alpha=1.0, rng=rng)
    assert ci.shape == imgs.shape
    np.testing.assert_allclose(cy.sum(axis=1), 1.0, atol=1e-6)
    collate = mixup_cutmix_collate(5, seed=0)
    out_i, out_y = collate((imgs, targets))
    assert out_i.dtype == np.float32 and out_y.shape == (4, 5)


def test_rand_augment_runs_all_ops():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(np.random.default_rng(1).integers(
        0, 256, (32, 32, 3), dtype=np.uint8), "RGB")
    for _ in range(30):  # cover most of the op space
        out = rand_augment(img, rng)
        assert out.size == (32, 32)


def test_in19k_cli_end_to_end(tmp_path):
    from tae_tpu.cli import train_recognition_in19k as cli

    make_fake_wds_shard(tmp_path / "t-000000.tar", num_samples=32, size=72,
                        num_classes=7)
    out = tmp_path / "out"
    out.mkdir()
    args = cli.get_args_parser().parse_args([
        "--model", "vit_recognition_numpatches16_vocab256_base",
        "--model_args", CLS_ARGS,
        "--encoder", "tae_patch16_vocab16_px256",
        "--encoder_args", ENC_ARGS,
        "--encoder_quantization", "int8",  # frozen stage in serving layout
        "--num_classes", "7",
        "--input_size", "64", "--batch_size", "8",
        "--num_its", "7", "--save_freq", "5", "--num_workers", "0",
        "--train_data_path", str(tmp_path / "t-000000.tar"),
        "--output_dir", str(out), "--save_prefix", "r19",
        "--device_normalize",  # uint8 H2D + on-device normalize path
    ])
    cli.main(args)
    log = (out / "r19_vit_recognition_numpatches16_vocab256_base_log.txt")
    rec = json.loads(log.read_text().strip().splitlines()[-1])
    assert {"train_loss", "train_acc1", "train_acc5", "iteration"} <= set(rec)
    assert (out / "r19_vit_recognition_numpatches16_vocab256_base_checkpoint"
            / "meta.json").exists()


def test_in1k_cli_head_swap_end_to_end(tmp_path):
    from tae_tpu.cli import train_recognition_in1k as cli
    from tae_tpu.cli import train_recognition_in19k as cli19

    # make a pretrained classifier ckpt with 7 classes via the in19k driver
    make_fake_wds_shard(tmp_path / "t-000000.tar", num_samples=24, size=72,
                        num_classes=7)
    pre = tmp_path / "pre"
    pre.mkdir()
    args19 = cli19.get_args_parser().parse_args([
        "--model", "vit_recognition_numpatches16_vocab256_base",
        "--model_args", CLS_ARGS,
        "--encoder", "tae_patch16_vocab16_px256", "--encoder_args", ENC_ARGS,
        "--num_classes", "7", "--input_size", "64", "--batch_size", "8",
        "--num_its", "6", "--save_freq", "5", "--num_workers", "0",
        "--train_data_path", str(tmp_path / "t-000000.tar"),
        "--output_dir", str(pre), "--save_prefix", "pre",
    ])
    cli19.main(args19)
    ckpt = pre / "pre_vit_recognition_numpatches16_vocab256_base_checkpoint"

    make_fake_imagefolder(tmp_path / "train", num_classes=3, per_class=6, size=72)
    make_fake_imagefolder(tmp_path / "val", num_classes=3, per_class=3, size=72)
    out = tmp_path / "out"
    out.mkdir()
    args = cli.get_args_parser().parse_args([
        "--model", "vit_recognition_numpatches16_vocab256_base",
        "--model_args", CLS_ARGS,
        "--model_ckpt", str(ckpt), "--pretrain_num_classes", "7",
        "--encoder", "tae_patch16_vocab16_px256", "--encoder_args", ENC_ARGS,
        "--num_classes", "3", "--input_size", "64", "--batch_size", "8",
        "--epochs", "2", "--num_workers", "0",
        "--train_data_path", str(tmp_path / "train"),
        "--val_data_path", str(tmp_path / "val"),
        "--output_dir", str(out), "--save_prefix", "ft",
    ])
    cli.main(args)
    log = out / "ft_vit_recognition_numpatches16_vocab256_base_log.txt"
    recs = [json.loads(l) for l in log.read_text().strip().splitlines()]
    assert len(recs) == 2
    assert {"test_acc1", "test_acc5", "test_loss", "epoch"} <= set(recs[-1])


def test_int8_quantized_recognition_tracks_float():
    """The int8 serving path covers the downstream latent classifiers too
    (same fused-block dispatch via vit.block_apply)."""
    import jax

    from tae_tpu import models
    from tae_tpu.ops.int8 import quantize_params
    from tae_tpu.utils.dtypes import FP32

    model = models.create("vit_recognition_numpatches16_vocab256_base",
                          decoder_embed_dim=128, decoder_depth=2,
                          decoder_num_heads=4, num_classes=10)
    params = model.init(jax.random.key(0))
    qp = quantize_params(params)
    assert qp["blocks"]["mlp"]["fc1"]["w_q"].dtype.name == "int8"
    z = jax.random.normal(jax.random.key(1), (4, 16, 256))
    logits = model.forward(params, z, policy=FP32)
    logits8 = model.forward(qp, z, policy=FP32)
    rel = float(np.mean(np.abs(np.asarray(logits8 - logits)))
                / (np.mean(np.abs(np.asarray(logits))) + 1e-9))
    assert logits8.shape == logits.shape and rel < 0.2, rel
