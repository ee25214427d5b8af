"""Tokenizer serving API + latent-shard round-trip tests."""

import json

import jax

import jax.numpy as jnp
import numpy as np
import pytest

from tae_tpu.data.fake import make_fake_wds_shard
from tae_tpu.tokenizer import Tokenizer

TINY = dict(img_size=64, embed_dim=64, depth=2, num_heads=4,
            decoder_embed_dim=64, decoder_depth=2, decoder_num_heads=4)


def test_tokenizer_encode_decode_roundtrip_shapes():
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **TINY)
    imgs = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    z = tok.encode(imgs)
    assert z.shape == (2, 16, 16)
    rec = tok.decode(z)
    assert rec.shape == (2, 3, 64, 64)
    rec2 = tok.reconstruct(imgs)
    np.testing.assert_allclose(np.asarray(rec2), np.asarray(rec), atol=1e-6)


def test_tokenizer_discrete_superset():
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, quantize=True,
                                    codebook_size=32, **TINY)
    imgs = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    ids = tok.encode_discrete(imgs)
    assert ids.shape == (2, 16) and ids.dtype == jnp.int32
    assert int(ids.max()) < 32
    rec = tok.decode_discrete(ids)
    assert rec.shape == (2, 3, 64, 64)


def test_tokenizer_rejects_discrete_without_codebook():
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **TINY)
    with pytest.raises(ValueError, match="codebook"):
        tok.encode_discrete(np.zeros((1, 16, 16), np.float32))


def test_tokenizer_encode_jpeg():
    import io

    from PIL import Image

    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **TINY)
    rng = np.random.default_rng(2)
    bufs = []
    for _ in range(2):
        arr = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr, "RGB").save(b, format="JPEG")
        bufs.append(b.getvalue())
    z = tok.encode_jpeg(bufs)
    assert z.shape == (2, 16, 16)


def test_latent_dataset_roundtrip(tmp_path):
    """encode CLI -> LatentDataset -> in19k training from latents."""
    from tae_tpu.cli import encode as cli_encode
    from tae_tpu.cli import train_recognition_in19k as cli19
    from tae_tpu.data.latents import LatentDataset

    make_fake_wds_shard(tmp_path / "d-000000.tar", num_samples=24, size=72,
                        num_classes=5)
    enc_out = tmp_path / "enc"
    enc_out.mkdir()
    enc_args_json = json.dumps(TINY)
    args = cli_encode.get_args_parser().parse_args([
        "--model", "tae_patch16_vocab16_px256", "--model_args", enc_args_json,
        "--input_size", "64", "--batch_size", "8", "--num_workers", "0",
        "--shard_size", "10", "--num_iters", "100",
        "--data_path", str(tmp_path / "d-000000.tar"),
        "--output_dir", str(enc_out), "--save_prefix", "tok",
        "--pth_output", str(tmp_path / "dump.pth")])
    cli_encode.main(args)

    ds = LatentDataset(enc_out)
    assert len(ds) == 24
    z, t = next(ds.iter_samples())
    assert z.shape == (16, 16) and z.dtype == np.float32

    # --pth_output wrote the reference's monolithic format (encode.py:93-100)
    import torch

    blob = torch.load(tmp_path / "dump.pth", weights_only=True)
    assert blob["latents"].shape == (24, 16, 16)
    assert blob["targets"].dtype == torch.int64
    np.testing.assert_array_equal(blob["latents"][0].float().numpy(),
                                  z.astype(np.float32))

    out = tmp_path / "cls"
    out.mkdir()
    cls_args = json.dumps(dict(vocab_size=16, num_patches=16,
                               decoder_embed_dim=48, decoder_depth=2,
                               decoder_num_heads=4))
    targs = cli19.get_args_parser().parse_args([
        "--model", "vit_recognition_numpatches16_vocab256_base",
        "--model_args", cls_args,
        "--latents_path", str(enc_out),
        "--num_classes", "5", "--batch_size", "8",
        "--num_its", "6", "--save_freq", "5", "--num_workers", "0",
        "--output_dir", str(out), "--save_prefix", "lat"])
    cli19.main(targs)
    log = out / "lat_vit_recognition_numpatches16_vocab256_base_log.txt"
    rec = json.loads(log.read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])


def test_latent_dataset_reads_reference_pth(tmp_path):
    """Drop-in migration: the reference encode.py:99-100 monolithic
    {latents, targets} .pth dump streams through LatentDataset."""
    import torch

    from tae_tpu.data.latents import LatentDataset

    z = torch.arange(24 * 16 * 16, dtype=torch.bfloat16).reshape(24, 16, 16)
    t = torch.arange(24, dtype=torch.int64)
    torch.save({"latents": z, "targets": t}, tmp_path / "latents.pth")

    ds = LatentDataset(tmp_path / "latents.pth")
    assert len(ds) == 24
    a, ta = next(ds.iter_samples())
    assert a.shape == (16, 16) and a.dtype == np.float32 and ta == 0
    # two workers stride the samples disjointly and cover everything
    seen = [tb for w in range(2)
            for _, tb in ds.iter_samples(shard_index=w, shard_count=2)]
    assert sorted(int(x) for x in seen) == list(range(24))
    # loop=True reshuffles and keeps yielding
    it = ds.iter_samples(loop=True, seed=3)
    first_pass = [int(next(it)[1]) for _ in range(25)]
    assert sorted(first_pass[:24]) == list(range(24))


def test_int8_quantized_encode_close_to_fp():
    from tae_tpu.ops.int8 import int8_linear, quantize_params, quantize_weight

    # op level: int8 linear approximates fp within quantization error
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    wq, s = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and s.shape == (32,)
    y = np.asarray(int8_linear(jnp.asarray(x), wq, s))
    ref = x @ w
    rel = np.abs(y - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02

    # model level: quantized tokenizer tracks the fp tokenizer
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **TINY)
    tok8 = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                     dtype=jnp.float32, quantization="int8",
                                     **TINY)
    # quantized tree has int8 weights everywhere, and the blocks are in the
    # serving layout (per-layer list, not depth-stacked scan operands)
    leaves = jax.tree.leaves(tok8.params)
    assert any(l.dtype == jnp.int8 for l in leaves)
    blocks = tok8.params["encoder"]["blocks"]
    assert isinstance(blocks, list)
    blk = blocks[0]
    assert blk["mlp"]["fc1"]["w_q"].dtype == jnp.int8
    assert blk["mlp"]["fc1"]["w_scale"].ndim == 1  # (hidden,)
    assert blk["attn"]["qkv"]["w_q"].ndim == 2
    imgs = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    z = np.asarray(tok.encode(imgs), np.float32)
    z8 = np.asarray(tok8.encode(imgs), np.float32)
    rel = np.abs(z8 - z).mean() / (np.abs(z).mean() + 1e-9)
    assert rel < 0.15  # a few % typical; generous bound for 2-layer random net


def test_patch_input_quantizes_patch_embed():
    """patch_input=True (pre-patchified deployments): the patch embed is
    quantized too, and encode agrees between image-layout and pre-patchified
    input and tracks the fp tokenizer within int8 tolerance."""
    from tae_tpu.ops.patchify import extract_patches

    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **TINY)
    tok8p = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                      dtype=jnp.float32, quantization="int8",
                                      patch_input=True, **TINY)
    pe = tok8p.params["encoder"]["patch_embed"]
    assert pe["w_q"].dtype == jnp.int8  # default mode keeps this in float
    imgs = np.random.default_rng(7).standard_normal((2, 3, 64, 64)).astype(np.float32)
    patches = np.asarray(extract_patches(jnp.asarray(imgs), 16))
    z_img = np.asarray(tok8p.encode(imgs), np.float32)
    z_pat = np.asarray(tok8p.encode(patches), np.float32)
    np.testing.assert_allclose(z_pat, z_img, atol=1e-5)
    z = np.asarray(tok.encode(imgs), np.float32)
    rel = np.abs(z_pat - z).mean() / (np.abs(z).mean() + 1e-9)
    assert rel < 0.15
    # int4 ignores the flag (its packer only covers transformer blocks)
    tok4p = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                      dtype=jnp.float32, quantization="int4",
                                      patch_input=True, **TINY)
    assert "w" in tok4p.params["encoder"]["patch_embed"]


def test_serving_artifact_roundtrip(tmp_path):
    """save_serving persists the quantized unstacked params; from_serving
    restores them (int8 dtypes, per-layer list layout) and produces the
    same latents without re-quantizing."""
    tok8 = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                     dtype=jnp.float32, quantization="int8",
                                     **TINY)
    tok8.save_serving(str(tmp_path / "art"))
    tok2 = Tokenizer.from_serving("tae_patch16_vocab16_px256",
                                  str(tmp_path / "art"), dtype=jnp.float32,
                                  **TINY)
    blocks = tok2.params["encoder"]["blocks"]
    assert isinstance(blocks, list)
    assert blocks[0]["mlp"]["fc1"]["w_q"].dtype == jnp.int8
    imgs = np.random.default_rng(5).standard_normal((2, 3, 64, 64)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(tok8.encode(imgs)),
                                  np.asarray(tok2.encode(imgs)))
    # a plain (training) checkpoint is rejected with a pointed message
    from tae_tpu.ckpt.io import save_checkpoint

    save_checkpoint(tmp_path / "plain", tok8.params)
    with pytest.raises(ValueError, match="serving artifact"):
        Tokenizer.from_serving("tae_patch16_vocab16_px256",
                               str(tmp_path / "plain"), **TINY)


def test_int8_unknown_mode_rejected():
    with pytest.raises(ValueError, match="quantization"):
        Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                  quantization="int2", **TINY)


def test_int4_quantized_tokenizer_tracks_fp():
    """quantization="int4": block linears become packed int4 (half the int8
    bytes), non-block linears stay int8, latents track fp within the coarser
    int4 tolerance; serving artifact round-trips."""
    big = dict(TINY, embed_dim=256)
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **big)
    tok4 = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                     dtype=jnp.float32, quantization="int4",
                                     **big)
    blocks = tok4.params["encoder"]["blocks"]
    assert isinstance(blocks, list)
    blk = blocks[0]
    fc1 = blk["mlp"]["fc1"]
    assert fc1["w4"].dtype == jnp.int8
    assert fc1["w4"].shape == (128, 1024)        # (D/2, H) packed
    assert fc1["w4_scale"].shape[1] == 1024      # (D/G, H) group scales
    assert "w4" in blk["attn"]["qkv"]
    # non-block linears keep the int8 form
    assert "w_q" in tok4.params["encoder"]["dict_proj"]
    imgs = np.random.default_rng(3).standard_normal((2, 3, 64, 64)).astype(np.float32)
    z = np.asarray(tok.encode(imgs), np.float32)
    z4 = np.asarray(tok4.encode(imgs), np.float32)
    rel = np.abs(z4 - z).mean() / (np.abs(z).mean() + 1e-9)
    assert rel < 0.5, rel  # int4 is a coarse code; random-init nets are worst-case


def test_int4_serving_artifact_roundtrip(tmp_path):
    big = dict(TINY, embed_dim=256)
    tok4 = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                     dtype=jnp.float32, quantization="int4",
                                     **big)
    tok4.save_serving(str(tmp_path / "art4"))
    tok2 = Tokenizer.from_serving("tae_patch16_vocab16_px256",
                                  str(tmp_path / "art4"), dtype=jnp.float32,
                                  **big)
    blk = tok2.params["encoder"]["blocks"][0]
    assert blk["mlp"]["fc1"]["w4"].dtype == jnp.int8
    imgs = np.random.default_rng(4).standard_normal((2, 3, 64, 64)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(tok4.encode(imgs)),
                                  np.asarray(tok2.encode(imgs)))


def test_component_pruning():
    """component="encoder" drops the decoder (half the resident weights),
    encode matches the full tokenizer exactly, decode raises; serving
    artifact round-trips pruned."""
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, **TINY)
    tok_e = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                      dtype=jnp.float32, component="encoder",
                                      **TINY)
    assert "decoder" not in tok_e.params and "encoder" in tok_e.params
    imgs = np.random.default_rng(5).standard_normal((2, 3, 64, 64)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(tok.encode(imgs)),
                                  np.asarray(tok_e.encode(imgs)))
    with pytest.raises(ValueError, match="decoder was pruned"):
        tok_e.decode(np.zeros((1, 16, 16), np.float32))
    tok_d = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                      dtype=jnp.float32, component="decoder",
                                      **TINY)
    with pytest.raises(ValueError, match="encoder was pruned"):
        tok_d.encode(imgs)
    z = tok.encode(imgs)
    np.testing.assert_array_equal(np.asarray(tok.decode(z)),
                                  np.asarray(tok_d.decode(z)))
    with pytest.raises(ValueError, match="unknown component"):
        Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                  component="middle", **TINY)


def test_component_pruned_serving_artifact(tmp_path):
    tok_e = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                      dtype=jnp.float32, quantization="int8",
                                      component="encoder", **TINY)
    tok_e.save_serving(str(tmp_path / "enc_art"))
    tok2 = Tokenizer.from_serving("tae_patch16_vocab16_px256",
                                  str(tmp_path / "enc_art"), **TINY)
    assert "decoder" not in tok2.params
    imgs = np.random.default_rng(6).standard_normal((2, 3, 64, 64)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(tok_e.encode(imgs)),
                                  np.asarray(tok2.encode(imgs)))
