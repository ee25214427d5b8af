"""Calibration stats (tae_tpu/calibrate.py) + calibrated equalization."""

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.tokenizer import Tokenizer

TINY = dict(img_size=64, embed_dim=64, depth=2, num_heads=4,
            decoder_embed_dim=64, decoder_depth=2, decoder_num_heads=4)


def _model_params(outlier=1.0):
    from tests.test_ops import _tiny_tae_params

    return _tiny_tae_params(outlier=outlier)


def test_ln_amax_tree_shape():
    from tae_tpu import calibrate

    model, params = _model_params()
    imgs = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    stats = calibrate.ln_amax(model, params, [imgs, imgs])
    enc = stats["encoder"]
    assert enc["blocks"]["attn"]["qkv"]["x_amax"].shape == (2, 64)
    assert enc["blocks"]["mlp"]["fc1"]["x_amax"].shape == (2, 64)
    assert enc["dict_proj"]["x_amax"].shape == (64,)
    dec = stats["decoder"]
    assert dec["blocks"]["attn"]["qkv"]["x_amax"].shape == (2, 64)
    assert dec["pred"]["x_amax"].shape == (64,)
    assert all(np.all(np.asarray(a) > 0) for a in jax.tree.leaves(stats))
    # margin scales everything
    stats2 = calibrate.ln_amax(model, params, [imgs], margin=2.0)
    a1 = np.asarray(calibrate.ln_amax(model, params, [imgs])
                    ["encoder"]["blocks"]["attn"]["qkv"]["x_amax"])
    a2 = np.asarray(stats2["encoder"]["blocks"]["attn"]["qkv"]["x_amax"])
    np.testing.assert_allclose(a2, 2.0 * a1, rtol=1e-6)


def test_calibrated_stats_match_true_ln_output_range():
    """The captured amax equals the actual LN outputs' per-channel max —
    checked against a hand-rolled forward on layer 0."""
    from tae_tpu import calibrate
    from tae_tpu.nn import vit

    model, params = _model_params()
    imgs = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3, 64, 64)).astype(np.float32))
    stats = calibrate.ln_amax(model, params, [imgs])
    c = model.cfg
    enc = params["encoder"]
    x = vit.patch_embed_apply(enc["patch_embed"], imgs, c.patch_size)
    x = x + enc["pos_embed"]
    blk0 = jax.tree.map(lambda a: a[0], enc["blocks"])
    ln1 = vit.layer_norm_apply(blk0["norm1"], x, c.ln_eps)
    expect = np.abs(np.asarray(ln1)).max(axis=(0, 1))
    got = np.asarray(stats["encoder"]["blocks"]["attn"]["qkv"]["x_amax"][0])
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_calibrated_equalization_improves_int8():
    """Calibrated equalization beats plain quantization on the outlier
    fixture, and plugs into equalize_params without shape errors."""
    from tae_tpu import calibrate
    from tae_tpu.ops.int8 import equalize_params, quantize_params
    from tae_tpu.utils.dtypes import Policy

    pol = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    model, params = _model_params(outlier=37.0)
    imgs = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 3, 64, 64)).astype(np.float32))
    stats = calibrate.ln_amax(model, params, [imgs])
    z_fp = np.asarray(model.forward_encoder(params, imgs, policy=pol))
    scale = np.abs(z_fp).max() + 1e-9
    z_q = np.asarray(model.forward_encoder(quantize_params(params), imgs,
                                           policy=pol))
    z_cal = np.asarray(model.forward_encoder(
        quantize_params(equalize_params(params, 0.5, act_amax=stats)), imgs,
        policy=pol))
    err_q = np.abs(z_q - z_fp).max() / scale
    err_cal = np.abs(z_cal - z_fp).max() / scale
    assert err_cal < 0.75 * err_q, (err_q, err_cal)


def test_tokenizer_calib_images_path():
    imgs = np.random.default_rng(3).standard_normal((2, 3, 64, 64)).astype(np.float32)
    tok = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                    dtype=jnp.float32, quantization="int8",
                                    equalize=0.5, calib_images=[imgs], **TINY)
    tok_p = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                      dtype=jnp.float32, quantization="int8",
                                      equalize=0.5, **TINY)
    # both encode, calibration changed the quantized weights
    z = np.asarray(tok.encode(imgs))
    assert np.isfinite(z).all()
    a = np.asarray(tok.params["encoder"]["blocks"][0]["attn"]["qkv"]["w_q"])
    b = np.asarray(tok_p.params["encoder"]["blocks"][0]["attn"]["qkv"]["w_q"])
    assert not np.array_equal(a, b)


def test_tokenizer_rejects_orphan_calibration_args():
    import pytest

    with pytest.raises(ValueError, match="require equalize"):
        Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                  quantization="int8",
                                  calib_images=[np.zeros((1, 3, 64, 64))],
                                  **TINY)
    with pytest.raises(ValueError, match="only applies to the quantized"):
        Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                  equalize=0.5, **TINY)


def test_int4_equalized_tokenizer_encodes():
    """equalize_params is shared by the int4 w4a8 path (same float-tree
    rewrite before packing)."""
    imgs = np.random.default_rng(4).standard_normal((2, 3, 64, 64)).astype(np.float32)
    tok4 = Tokenizer.from_checkpoint("tae_patch16_vocab16_px256",
                                     dtype=jnp.float32, quantization="int4",
                                     equalize=0.5, **TINY)
    z = np.asarray(tok4.encode(imgs))
    assert np.isfinite(z).all() and z.shape == (2, 16, 16)
