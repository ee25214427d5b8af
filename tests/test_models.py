"""Model-family tests: registry completeness, param-count parity with the
reference (analytic), forward shapes/dtypes, and basic behaviors."""

import jax
import jax.numpy as jnp
import pytest

from tae_tpu import models
from tae_tpu.utils.dtypes import FP32, Policy

TINY_TAE = dict(img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
                decoder_embed_dim=48, decoder_depth=2, decoder_num_heads=4,
                vocab_size=16)


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def tae_param_count(c):
    """Analytic parameter count of the reference TAE (reference tae.py:133-172)."""
    def block(d, mlp=4):
        attn = d * 3 * d + 3 * d + d * d + d          # qkv (w+b) + proj (w+b)
        mlp_p = d * mlp * d + mlp * d + mlp * d * d + d
        return attn + mlp_p + 4 * d                   # + 2 LayerNorms

    n = (c.img_size // c.patch_size) ** 2
    enc = (c.patch_size ** 2 * c.in_chans * c.embed_dim + c.embed_dim   # patch embed
           + n * c.embed_dim                                            # pos embed
           + c.depth * block(c.embed_dim)
           + 2 * c.embed_dim                                            # final LN
           + c.embed_dim * c.vocab_size)                                # dict_proj, no bias
    dec = (c.vocab_size * c.decoder_embed_dim + c.decoder_embed_dim
           + n * c.decoder_embed_dim
           + c.decoder_depth * block(c.decoder_embed_dim)
           + 2 * c.decoder_embed_dim
           + c.decoder_embed_dim * (c.patch_size ** 2 * c.in_chans)
           + c.patch_size ** 2 * c.in_chans)
    return enc + dec


def test_registry_has_all_36_reference_names():
    assert len(models.list_models("tae_")) == 12
    assert len(models.list_models("vit_recognition_")) == 12
    assert len(models.list_models("vit_segmentation_")) == 12
    # spot-check exact names from the reference registry (tae.py:434-591)
    for name in ["tae_patch16_vocab16_px256", "tae_patch128_vocab16384_px256",
                 "vit_recognition_numpatches4_vocab16384_base",
                 "vit_segmentation_numpatches256_vocab16_base"]:
        assert name in models.list_models()


@pytest.mark.parametrize("name", models.list_models("tae_"))
def test_tae_param_counts_match_reference_analytic(name):
    model = models.create(name)
    # init only the cheapest config for real; use eval_shape for the big ones
    shapes = jax.eval_shape(lambda k: model.init(k), jax.random.key(0))
    assert n_params(shapes) == tae_param_count(model.cfg)


def test_tae_forward_shapes_and_loss():
    model = models.tae.TAE(models.tae.TAEConfig(**TINY_TAE))
    params = model.init(jax.random.key(0))
    imgs = jax.random.normal(jax.random.key(1), (2, 3, 64, 64))
    loss, pred = model.forward(params, imgs, policy=FP32)
    n = model.cfg.num_patches
    assert pred.shape == (2, n, 16 * 16 * 3)
    assert loss.shape == () and jnp.isfinite(loss)
    recon = model.unpatchify(pred)
    assert recon.shape == (2, 3, 64, 64)
    # loss equals mean squared patch error
    target = model.patchify(imgs)
    assert jnp.allclose(loss, jnp.mean((pred - target) ** 2), rtol=1e-6)


def test_tae_forward_partial_unroll_matches_scan():
    """lax.scan partial unroll (unroll=2 with remat — the train-perf
    configuration, see docs/KERNELS.md train-side findings) computes the
    same function as the default scan, up to reassociation rounding."""
    model = models.tae.TAE(models.tae.TAEConfig(**TINY_TAE))
    params = model.init(jax.random.key(0))
    imgs = jax.random.normal(jax.random.key(1), (2, 3, 64, 64))
    loss_ref, pred_ref = model.forward(params, imgs, policy=FP32)
    loss_u, pred_u = jax.jit(
        lambda p, b: model.forward(p, b, policy=FP32, remat=True, unroll=2)
    )(params, imgs)
    assert jnp.allclose(loss_ref, loss_u, rtol=1e-4)
    assert jnp.allclose(pred_ref, pred_u, rtol=1e-3, atol=1e-4)


def test_tae_bf16_policy_latent_dtype():
    """bf16 latents out of the encoder — the TPU analogue of the reference's
    fp16 dtype smoke test (reference tests/test_dtype.py:76-81)."""
    model = models.tae.TAE(models.tae.TAEConfig(**TINY_TAE))
    params = model.init(jax.random.key(0))
    imgs = jnp.zeros((1, 3, 64, 64), jnp.float32)
    z = model.forward_encoder(params, imgs, policy=Policy())
    assert z.dtype == jnp.bfloat16
    assert z.shape == (1, 16, 16)


def test_recognition_forward():
    m = models.create("vit_recognition_numpatches16_vocab256_base", num_classes=10,
                      decoder_embed_dim=48, decoder_depth=2, decoder_num_heads=4)
    params = m.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 16, 256))
    logits = m.forward(params, z, policy=FP32)
    assert logits.shape == (2, 10)
    # identity head when num_classes is None (reference tae.py:295)
    m2 = models.create("vit_recognition_numpatches16_vocab256_base",
                       decoder_embed_dim=48, decoder_depth=2, decoder_num_heads=4)
    feats = m2.forward(m2.init(jax.random.key(0)), z, policy=FP32)
    assert feats.shape == (2, 48)


def test_recognition_head_swap():
    m = models.create("vit_recognition_numpatches16_vocab256_base", num_classes=19167,
                      decoder_embed_dim=48, decoder_depth=2, decoder_num_heads=4)
    params = m.init(jax.random.key(0))
    m2, params2 = m.replace_head(params, jax.random.key(1), 1000)
    assert params2["head"]["w"].shape == (48, 1000)
    assert params2["blocks"] is params["blocks"]  # trunk untouched
    z = jax.random.normal(jax.random.key(2), (2, 16, 256))
    assert m2.forward(params2, z, policy=FP32).shape == (2, 1000)


def test_segmentation_forward_full_resolution():
    m = models.create("vit_segmentation_numpatches16_vocab256_base", num_classes=21,
                      decoder_embed_dim=48, decoder_depth=4, decoder_num_heads=4)
    assert m.cfg.aux_depth == 3  # int(0.75 * 4), reference tae.py:358
    params = m.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 16, 256))
    out = m.forward(params, z, policy=FP32)
    assert set(out) == {"out", "aux"}
    # derived patch size 64 -> 4x4 grid of 64px patches = full 256px map
    assert out["out"].shape == (2, 21, 256, 256)
    assert out["aux"].shape == (2, 21, 256, 256)


def test_vq_superset_off_by_default_and_works_when_on():
    import dataclasses

    base = models.tae.TAEConfig(**TINY_TAE)
    assert base.quantize is False
    model = models.tae.TAE(dataclasses.replace(base, quantize=True, codebook_size=32))
    params = model.init(jax.random.key(0))
    assert params["codebook"].shape == (32, 16)
    imgs = jax.random.normal(jax.random.key(1), (2, 3, 64, 64))
    loss, pred = model.forward(params, imgs, policy=FP32)
    assert jnp.isfinite(loss)
    # gradient flows through the STE to the encoder
    g = jax.grad(lambda p: model.forward(p, imgs, policy=FP32)[0])(params)
    gnorm = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g["encoder"]))
    assert gnorm > 0
