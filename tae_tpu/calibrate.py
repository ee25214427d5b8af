"""Activation-range calibration for the quantized serving path.

The int8/int4 serving modes quantize activations per row, so a handful of
large channels set every other channel's step size. ``equalize_params``
(:mod:`tae_tpu.ops.int8`) flattens that per-channel spread by folding factors
into the LN affines; without data it estimates each channel's activation
range from the affine itself. This module computes the *measured* per-channel
LN-output amax over real batches — the SmoothQuant calibration pass
(arXiv:2211.10438 §4; typically a few hundred images) — in exactly the
``act_amax`` tree shape ``equalize_params`` consumes.

The capture runs the same ``tae_tpu.nn.vit`` primitives the model forward
uses, layer by layer (the scanned forward can't expose per-layer LN outputs
without widening its carry). The reference has no quantized path at all
(serving superset; reference ``encode.py`` runs fp16 autocast).

Usage::

    stats = calibrate.ln_amax(model, params, batches)   # batches: iterable
    tok = Tokenizer.from_checkpoint(name, ckpt, quantization="int8",
                                    equalize=0.5, act_amax=stats)

or in one step via ``Tokenizer.from_checkpoint(..., equalize=0.5,
calib_images=imgs)``.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp

Params = Any


def _amax(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel (last-axis) amax over all leading axes, fp32."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)),
                   axis=tuple(range(x.ndim - 1)))


def _blocks_ln_amax(half: Params, x: jnp.ndarray, cfg) -> tuple[jnp.ndarray, dict]:
    """Run the stacked block params layer by layer, capturing each LN output's
    per-channel amax (the activation the following qkv/fc1 quantizes)."""
    from tae_tpu.nn import vit

    blocks = half["blocks"]
    depth = jax.tree.leaves(blocks)[0].shape[0]
    qkv_a, fc1_a = [], []
    for i in range(depth):
        blk = jax.tree.map(lambda a, i=i: a[i], blocks)
        ln1 = vit.layer_norm_apply(blk["norm1"], x, cfg.ln_eps)
        qkv_a.append(_amax(ln1))
        x = x + vit.attention_apply(blk["attn"], ln1, cfg.attn, backend="xla")
        ln2 = vit.layer_norm_apply(blk["norm2"], x, cfg.ln_eps)
        fc1_a.append(_amax(ln2))
        x = x + vit.mlp_apply(blk["mlp"], ln2)
    stats = {"blocks": {"attn": {"qkv": {"x_amax": jnp.stack(qkv_a)}},
                        "mlp": {"fc1": {"x_amax": jnp.stack(fc1_a)}}}}
    return x, stats


def _batch_stats(model, params: Params, imgs: jnp.ndarray) -> dict:
    from tae_tpu.data.transforms import maybe_device_normalize
    from tae_tpu.nn import vit

    c = model.cfg
    stats: dict = {}
    if "encoder" in params:
        # same input dispatch as Tokenizer.encode: uint8 batches (the native
        # device-normalize serving path) are normalized here too, so the
        # measured ranges match what the quantized forward actually sees
        imgs = maybe_device_normalize(imgs, c.patch_size, jnp.float32)
        enc = params["encoder"]
        if imgs.ndim == 3:
            x = vit.linear_apply(enc["patch_embed"], imgs)
        else:
            x = vit.patch_embed_apply(enc["patch_embed"], imgs, c.patch_size)
        x = x + enc["pos_embed"]
        x, s = _blocks_ln_amax(enc, x, c.enc_block)
        final = vit.layer_norm_apply(enc["norm"], x, c.ln_eps)
        s["dict_proj"] = {"x_amax": _amax(final)}
        stats["encoder"] = s
        z = vit.linear_apply(enc["dict_proj"], final)
    else:
        z = imgs  # decoder-only tree: imgs must already be latents
    if getattr(c, "quantize", False) and "codebook" in params:
        # VQ superset: the decoder only ever sees codebook vectors, so the
        # stats must be measured on the post-bottleneck distribution
        from tae_tpu.ops.quantizer import vq_ste

        z, _ = vq_ste(z, params["codebook"], beta=c.commitment_beta)
    if "decoder" in params:
        dec = params["decoder"]
        x = vit.linear_apply(dec["embed"], z)
        x = x + dec["pos_embed"]
        x, s = _blocks_ln_amax(dec, x, c.dec_block)
        final = vit.layer_norm_apply(dec["norm"], x, c.ln_eps)
        s["pred"] = {"x_amax": _amax(final)}
        stats["decoder"] = s
    return stats


def ln_amax(model, params: Params, batches: Iterable, margin: float = 1.0
            ) -> dict:
    """Per-channel LN-output amax stats for ``equalize_params(act_amax=...)``.

    ``model``/``params``: the FLOAT model (before quantization; pruned trees
    fine — stats cover whatever halves exist). ``batches``: iterable of image
    batches (B, 3, H, W) — or pre-patchified (B, N, C·p²), or latent batches
    for a decoder-only tree. ``margin`` scales the collected amax (>1 guards
    against unseen outliers; 1.0 = plain max). Stats are max-accumulated
    across batches.
    """
    fn = jax.jit(lambda p, b: _batch_stats(model, p, b))
    acc = None
    for batch in batches:
        s = fn(params, jnp.asarray(batch))
        acc = s if acc is None else jax.tree.map(jnp.maximum, acc, s)
    if acc is None:
        raise ValueError("ln_amax needs at least one calibration batch")
    if margin != 1.0:
        acc = jax.tree.map(lambda a: a * margin, acc)
    return acc
