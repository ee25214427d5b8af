"""Latent-space dense-prediction ViT with an auxiliary head.

Functional counterpart of the reference segmenter (reference tae.py:341-429):
embeds frozen TAE latents, runs a ViT-Base trunk, taps an auxiliary head after
``int(0.75·depth)`` blocks (tae.py:358,416-420), and unpatchifies both main
and aux per-patch class logits to dense (B, num_classes, H, W) maps. Returns a
dict {"out", "aux"} like the reference's OrderedDict (tae.py:413,426-428).

The depth-stacked block params are applied as two ``lax.scan`` segments split
at the aux depth — same math as the reference's in-loop tap, but still a
single compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tae_tpu.nn import vit
from tae_tpu.nn import init as tinit
from tae_tpu.models.registry import register_model
from tae_tpu.ops.patchify import unpatchify
from tae_tpu.utils.dtypes import DEFAULT, Policy

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SegmentationConfig:
    num_patches: int = 256
    patch_size: int = 16
    vocab_size: int = 16
    decoder_embed_dim: int = 768
    decoder_depth: int = 12
    decoder_num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    num_classes: int = 21

    @property
    def aux_depth(self) -> int:
        return int(self.decoder_depth * 0.75)

    @property
    def block(self) -> vit.BlockConfig:
        return vit.BlockConfig(self.decoder_embed_dim, self.decoder_num_heads,
                               self.mlp_ratio, qkv_bias=True, ln_eps=self.ln_eps)


def _slice_blocks(stacked: Params, start: int, stop: int) -> Params:
    return jax.tree.map(lambda a: a[start:stop], stacked)


@dataclasses.dataclass(frozen=True)
class SegmentationViT:
    cfg: SegmentationConfig

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        c = self.cfg
        keys = jax.random.split(key, 5)
        head_dim = c.patch_size ** 2 * c.num_classes
        return {
            "embed": vit.linear_init(keys[0], c.vocab_size, c.decoder_embed_dim,
                                     dtype=dtype),
            "pos_embed": tinit.trunc_normal(keys[1], (1, c.num_patches,
                                                      c.decoder_embed_dim),
                                            std=0.02, dtype=dtype),
            "blocks": vit.blocks_init(keys[2], c.block, c.decoder_depth, dtype),
            "norm": vit.layer_norm_init(c.decoder_embed_dim, dtype),
            "aux_norm": vit.layer_norm_init(c.decoder_embed_dim, dtype),
            "head": vit.linear_init(keys[3], c.decoder_embed_dim, head_dim, dtype=dtype),
            "aux_head": vit.linear_init(keys[4], c.decoder_embed_dim, head_dim,
                                        dtype=dtype),
        }

    def forward(self, params: Params, z: jnp.ndarray, *,
                policy: Policy = DEFAULT, backend: str | None = None,
                remat: bool = False, mesh=None) -> dict[str, jnp.ndarray]:
        """``mesh``: when training sharded, pass the device mesh so the
        head outputs and dense maps are pinned to batch sharding on both
        sides of the dim-mixing unpatchify reshape — otherwise GSPMD
        resolves the backward's sharding conflict with an involuntary full
        rematerialization (see parallel.sharding.constrain_batch)."""
        from tae_tpu.parallel.sharding import constrain_batch

        c = self.cfg
        p = policy.cast_to_compute(params)
        x = z.astype(policy.compute_dtype)
        x = vit.linear_apply(p["embed"], x)
        x = x + p["pos_embed"]

        # blocks [0, aux_depth): then tap the auxiliary head (tae.py:416-420)
        x = vit.blocks_apply(_slice_blocks(p["blocks"], 0, c.aux_depth), x,
                             c.block, backend=backend, remat=remat)
        aux = vit.linear_apply(p["aux_head"],
                               vit.layer_norm_apply(p["aux_norm"], x, c.ln_eps))
        aux = constrain_batch(aux, mesh)
        aux = constrain_batch(unpatchify(aux, c.patch_size, c.num_classes), mesh)

        # remaining blocks, main head
        x = vit.blocks_apply(_slice_blocks(p["blocks"], c.aux_depth,
                                           c.decoder_depth), x,
                             c.block, backend=backend, remat=remat)
        x = vit.layer_norm_apply(p["norm"], x, c.ln_eps)
        out = vit.linear_apply(p["head"], x)
        out = constrain_batch(out, mesh)
        out = constrain_batch(unpatchify(out, c.patch_size, c.num_classes), mesh)

        return {"out": policy.cast_to_output(out), "aux": policy.cast_to_output(aux)}

    def replace_head(self, params: Params, key: jax.Array, num_classes: int,
                     dtype=jnp.float32) -> tuple["SegmentationViT", Params]:
        """Swap both dense heads for a new class count
        (reference segmentation/train.py:156-157)."""
        cfg = dataclasses.replace(self.cfg, num_classes=num_classes)
        head_dim = cfg.patch_size ** 2 * num_classes
        k1, k2 = jax.random.split(key)
        params = dict(params)
        params["head"] = vit.linear_init(k1, cfg.decoder_embed_dim, head_dim, dtype=dtype)
        params["aux_head"] = vit.linear_init(k2, cfg.decoder_embed_dim, head_dim,
                                             dtype=dtype)
        return SegmentationViT(cfg), params


# ---------------------------------------------------------------------------
# Registry: 12 configs (reference tae.py:542-591).
#
# Deliberate divergence (documented per SURVEY.md §7 "preserve-or-fix"): the
# reference factories never pass ``patch_size``, so all of them inherit the
# default 16 — which makes every non-numpatches256 config unpatchify to a map
# smaller than the 256px target and crash in the CE loss. We derive the patch
# size from the token grid (numpatches 256/64/16/4 -> p 16/32/64/128) so every
# config produces a full-resolution 256px prediction, matching the evident
# intent. Pass ``patch_size=16`` explicitly to reproduce the reference's
# literal behavior.
# ---------------------------------------------------------------------------

_GRID: dict[int, tuple[int, tuple[int, ...]]] = {
    256: (16, (16, 64, 256)),
    64: (32, (64, 256, 1024)),
    16: (64, (256, 1024, 4096)),
    4: (128, (1024, 4096, 16384)),
}


def _make_factory(num_patches: int, patch_size: int, vocab: int):
    def factory(num_classes: int | None = None, **overrides) -> SegmentationViT:
        cfg = SegmentationConfig(num_patches=num_patches, patch_size=patch_size,
                                 vocab_size=vocab,
                                 num_classes=21 if num_classes is None else num_classes)
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        return SegmentationViT(cfg)

    return factory


for _n, (_p, _vs) in _GRID.items():
    for _v in _vs:
        register_model(f"vit_segmentation_numpatches{_n}_vocab{_v}_base",
                       _make_factory(_n, _p, _v))
