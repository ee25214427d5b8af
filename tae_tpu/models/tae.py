"""TAE — transformer autoencoder ("first-stage" image tokenizer).

Functional re-design of the reference model (reference tae.py:133-271):
a ViT encoder ending in a bias-free ``dict_proj`` linear down to
``vocab_size`` channels (the continuous bottleneck, tae.py:160,237), and a
ViT decoder reading the bottleneck back up to per-patch pixel predictions
(tae.py:165-169,240-254). The training objective is plain mean MSE in patch
space (tae.py:256-265). Despite the name "vocab", the reference forward path
is fully continuous — no quantization exists (SURVEY.md §0). We reproduce that
default exactly and additionally offer an *optional* VQ bottleneck
(``quantize=True``: codebook nearest-neighbor + straight-through estimator,
see :mod:`tae_tpu.ops.quantizer`) as a strict superset, off by default.

All 12 reference configs (reference tae.py:434-483) are registered under their
original names.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tae_tpu.nn import vit
from tae_tpu.nn import init as tinit
from tae_tpu.models.registry import register_model
from tae_tpu.ops.patchify import patchify, unpatchify
from tae_tpu.utils.dtypes import DEFAULT, Policy

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TAEConfig:
    img_size: int = 256
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    vocab_size: int = 16
    depth: int = 15
    num_heads: int = 16
    decoder_embed_dim: int = 1024
    decoder_depth: int = 15
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    # --- superset options (not in the reference; default-off keeps parity) ---
    quantize: bool = False        # VQ bottleneck: codebook argmin + STE
    codebook_size: int = 8192     # number of codebook entries when quantize=True
    commitment_beta: float = 0.25 # VQ commitment-loss weight

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def enc_block(self) -> vit.BlockConfig:
        return vit.BlockConfig(self.embed_dim, self.num_heads, self.mlp_ratio,
                               qkv_bias=True, ln_eps=self.ln_eps)

    @property
    def dec_block(self) -> vit.BlockConfig:
        return vit.BlockConfig(self.decoder_embed_dim, self.decoder_num_heads,
                               self.mlp_ratio, qkv_bias=True, ln_eps=self.ln_eps)


@dataclasses.dataclass(frozen=True)
class TAE:
    """Config holder + pure model functions. Parameters live in an explicit
    pytree; nothing here is stateful, so every method jits/shards freely."""

    cfg: TAEConfig

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        c = self.cfg
        keys = jax.random.split(key, 8)
        params: Params = {
            "encoder": {
                "patch_embed": vit.patch_embed_init(keys[0], c.patch_size, c.in_chans,
                                                    c.embed_dim, dtype),
                "pos_embed": tinit.trunc_normal(keys[1], (1, c.num_patches, c.embed_dim),
                                                std=0.02, dtype=dtype),
                "blocks": vit.blocks_init(keys[2], c.enc_block, c.depth, dtype),
                "norm": vit.layer_norm_init(c.embed_dim, dtype),
                # bias-free bottleneck projection (reference tae.py:160)
                "dict_proj": vit.linear_init(keys[3], c.embed_dim, c.vocab_size,
                                             bias=False, dtype=dtype),
            },
            "decoder": {
                "embed": vit.linear_init(keys[4], c.vocab_size, c.decoder_embed_dim,
                                         dtype=dtype),
                "pos_embed": tinit.trunc_normal(keys[5], (1, c.num_patches,
                                                          c.decoder_embed_dim),
                                                std=0.02, dtype=dtype),
                "blocks": vit.blocks_init(keys[6], c.dec_block, c.decoder_depth, dtype),
                "norm": vit.layer_norm_init(c.decoder_embed_dim, dtype),
                "pred": vit.linear_init(keys[7], c.decoder_embed_dim,
                                        c.patch_size ** 2 * c.in_chans, dtype=dtype),
            },
        }
        if c.quantize:
            # VQ codebook over the vocab_size-dim latent space (superset).
            cb_key = jax.random.fold_in(key, 0x5EED)
            params["codebook"] = jax.random.uniform(
                cb_key, (c.codebook_size, c.vocab_size), dtype,
                minval=-1.0 / c.codebook_size, maxval=1.0 / c.codebook_size)
        return params

    # --------------------------------------------------------------- forward
    def forward_encoder(self, params: Params, imgs: jnp.ndarray, *,
                        policy: Policy = DEFAULT, backend: str | None = None,
                        remat: bool | str = False, unroll: bool | int = False,
                        serving: bool = False) -> jnp.ndarray:
        """(B, C, H, W) -> latents (B, N, vocab_size). Reference tae.py:224-238.

        Also accepts pre-patchified (B, N, C·p²) input in extract_patches
        layout (channel-major per patch) — the native decoder can emit that
        layout directly (``patch_layout``), making patch embedding a pure
        MXU matmul with zero on-device relayout (profiled ~4% of p128
        encode)."""
        c = self.cfg
        enc = policy.cast_to_compute(params["encoder"])
        if imgs.ndim == 3:
            expect = (c.num_patches, c.patch_size ** 2 * c.in_chans)
            if imgs.shape[1:] != expect:
                raise ValueError(f"pre-patchified input {imgs.shape[1:]} "
                                 f"doesn't match model {expect}")
            x = vit.linear_apply(enc["patch_embed"],
                                 imgs.astype(policy.compute_dtype))
        else:
            if imgs.shape[-2:] != (c.img_size, c.img_size):
                raise ValueError(
                    f"input image size {imgs.shape[-2:]} doesn't match model "
                    f"img_size {c.img_size} (reference tae.py:48-49 semantics)")
            x = imgs.astype(policy.compute_dtype)
            x = vit.patch_embed_apply(enc["patch_embed"], x, c.patch_size)
        x = x + enc["pos_embed"]
        x = self._blocks_then_head(enc, x, c.enc_block, "dict_proj",
                                   backend=backend, remat=remat,
                                   unroll=unroll, policy=policy,
                                   serving=serving)
        return policy.cast_to_output(x)

    def forward_decoder(self, params: Params, z: jnp.ndarray, *,
                        policy: Policy = DEFAULT, backend: str | None = None,
                        remat: bool | str = False, unroll: bool | int = False,
                        serving: bool = False) -> jnp.ndarray:
        """latents (B, N, vocab) -> per-patch pixel preds (B, N, p²·C).
        Reference tae.py:240-254."""
        c = self.cfg
        dec = policy.cast_to_compute(params["decoder"])
        x = z.astype(policy.compute_dtype)
        x = vit.linear_apply(dec["embed"], x)
        x = x + dec["pos_embed"]
        x = self._blocks_then_head(dec, x, c.dec_block, "pred",
                                   backend=backend, remat=remat,
                                   unroll=unroll, policy=policy,
                                   serving=serving)
        return policy.cast_to_output(x)

    def _blocks_then_head(self, half: Params, x: jnp.ndarray, block_cfg,
                          head: str, *, backend, remat, unroll, policy,
                          serving: bool = False):
        """Block stack -> final LN -> head linear; in the int8 serving
        layout (unstacked blocks + quantized head) the final LN + head-
        input quantize chain into the last block's MLP epilogue."""
        c = self.cfg
        chain = (isinstance(half["blocks"], (list, tuple))
                 and "w_q" in half.get(head, {}))
        out = vit.blocks_apply(half["blocks"], x, block_cfg, backend=backend,
                               remat=remat, unroll=unroll,
                               final_norm=half["norm"] if chain else None,
                               serving=serving)
        if chain:
            x, ln = out
            if ln is not None:
                xq, sx = ln
                b_, n_, _ = x.shape
                y = vit._qlinear(half[head], xq, x_scale=sx,
                                 out_dtype=policy.compute_dtype)
                return y.reshape(b_, n_, -1)
        else:
            x = out
        x = vit.layer_norm_apply(half["norm"], x, c.ln_eps)
        return vit.linear_apply(half[head], x)

    def forward_loss(self, imgs: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """Mean per-pixel MSE in patch space, computed in fp32
        (reference tae.py:256-265; autocast promotes the fp16−fp32 subtraction
        to fp32, which we match explicitly)."""
        target = patchify(imgs, self.cfg.patch_size).astype(jnp.float32)
        diff = pred.astype(jnp.float32) - target
        return jnp.mean(jnp.square(diff))

    def forward(self, params: Params, imgs: jnp.ndarray, *,
                policy: Policy = DEFAULT, backend: str | None = None,
                remat: bool | str = False,
                unroll: bool | int = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Full autoencode: returns (loss, pred). Reference tae.py:267-271.

        With ``quantize=True`` the latent passes through the VQ bottleneck and
        the loss gains codebook + commitment terms; the default path is the
        reference's continuous bottleneck, untouched.
        """
        z = self.forward_encoder(params, imgs, policy=policy, backend=backend,
                                 remat=remat, unroll=unroll)
        aux_loss = 0.0
        if self.cfg.quantize:
            from tae_tpu.ops.quantizer import vq_ste

            z, aux_loss = vq_ste(z, params["codebook"],
                                 beta=self.cfg.commitment_beta)
        pred = self.forward_decoder(params, z, policy=policy, backend=backend,
                                    remat=remat, unroll=unroll)
        loss = self.forward_loss(imgs, pred) + aux_loss
        return loss, pred

    # ----------------------------------------------------------------- utils
    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        return patchify(imgs, self.cfg.patch_size)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        return unpatchify(x, self.cfg.patch_size, self.cfg.in_chans)


# ---------------------------------------------------------------------------
# Registry: the 12 reference configs (reference tae.py:434-483).
# patch size -> trunk shape; each patch size offers 3 bottleneck widths.
# ---------------------------------------------------------------------------

_TRUNKS: dict[int, dict[str, int]] = {
    16: dict(embed_dim=1024, depth=15, num_heads=16),
    32: dict(embed_dim=2048, depth=18, num_heads=32),
    64: dict(embed_dim=2560, depth=21, num_heads=32),
    128: dict(embed_dim=2560, depth=22, num_heads=32),
}

_VOCABS: dict[int, tuple[int, ...]] = {
    16: (16, 64, 256),
    32: (64, 256, 1024),
    64: (256, 1024, 4096),
    128: (1024, 4096, 16384),
}


def _make_factory(patch: int, vocab: int):
    trunk = _TRUNKS[patch]

    def factory(**overrides) -> TAE:
        cfg = TAEConfig(
            img_size=256,
            patch_size=patch,
            vocab_size=vocab,
            embed_dim=trunk["embed_dim"],
            depth=trunk["depth"],
            num_heads=trunk["num_heads"],
            decoder_embed_dim=trunk["embed_dim"],
            decoder_depth=trunk["depth"],
            decoder_num_heads=trunk["num_heads"],
            mlp_ratio=4.0,
            ln_eps=1e-6,
        )
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        return TAE(cfg)

    return factory


for _p, _vs in _VOCABS.items():
    for _v in _vs:
        register_model(f"tae_patch{_p}_vocab{_v}_px256", _make_factory(_p, _v))
