"""Latent-space recognition ViT ("PatchEmbedless ViT").

Functional counterpart of the reference classifier (reference tae.py:274-338):
consumes frozen TAE encoder latents (B, N, vocab), embeds them, runs a
ViT-Base trunk, mean-pools over tokens and applies a linear head
(tae.py:330-333). All 12 reference configs (tae.py:488-537) are registered.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tae_tpu.nn import vit
from tae_tpu.nn import init as tinit
from tae_tpu.models.registry import register_model
from tae_tpu.utils.dtypes import DEFAULT, Policy

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RecognitionConfig:
    num_patches: int = 256
    vocab_size: int = 16
    decoder_embed_dim: int = 768
    decoder_depth: int = 12
    decoder_num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    num_classes: int | None = None   # None -> identity head (feature extractor)

    @property
    def block(self) -> vit.BlockConfig:
        return vit.BlockConfig(self.decoder_embed_dim, self.decoder_num_heads,
                               self.mlp_ratio, qkv_bias=True, ln_eps=self.ln_eps)


@dataclasses.dataclass(frozen=True)
class RecognitionViT:
    cfg: RecognitionConfig

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        c = self.cfg
        keys = jax.random.split(key, 4)
        params: Params = {
            "embed": vit.linear_init(keys[0], c.vocab_size, c.decoder_embed_dim,
                                     dtype=dtype),
            "pos_embed": tinit.trunc_normal(keys[1], (1, c.num_patches,
                                                      c.decoder_embed_dim),
                                            std=0.02, dtype=dtype),
            "blocks": vit.blocks_init(keys[2], c.block, c.decoder_depth, dtype),
            "norm": vit.layer_norm_init(c.decoder_embed_dim, dtype),
        }
        if c.num_classes is not None:
            params["head"] = vit.linear_init(keys[3], c.decoder_embed_dim,
                                             c.num_classes, dtype=dtype)
        return params

    def forward_features(self, params: Params, z: jnp.ndarray, *,
                         policy: Policy = DEFAULT, backend: str | None = None,
                         remat: bool = False) -> jnp.ndarray:
        """(B, N, vocab) -> (B, N, D). Reference tae.py:317-328."""
        c = self.cfg
        p = policy.cast_to_compute(params)
        x = z.astype(policy.compute_dtype)
        x = vit.linear_apply(p["embed"], x)
        x = x + p["pos_embed"]
        x = vit.blocks_apply(p["blocks"], x, c.block, backend=backend, remat=remat)
        return vit.layer_norm_apply(p["norm"], x, c.ln_eps)

    def forward_head(self, params: Params, x: jnp.ndarray, *,
                     policy: Policy = DEFAULT) -> jnp.ndarray:
        """Mean-pool over tokens, then the linear head (reference tae.py:330-333)."""
        x = x.mean(axis=1)
        if "head" in params:
            head = policy.cast_to_compute(params["head"])
            x = vit.linear_apply(head, x)
        return x

    def forward(self, params: Params, z: jnp.ndarray, *,
                policy: Policy = DEFAULT, backend: str | None = None,
                remat: bool = False) -> jnp.ndarray:
        x = self.forward_features(params, z, policy=policy, backend=backend,
                                  remat=remat)
        x = self.forward_head(params, x, policy=policy)
        return policy.cast_to_output(x)

    def replace_head(self, params: Params, key: jax.Array, num_classes: int,
                     dtype=jnp.float32) -> tuple["RecognitionViT", Params]:
        """Head-swap transfer: keep the trunk, re-init the classifier head for a
        new label space (reference recognition/train_recognition_in1k.py:126-128)."""
        cfg = dataclasses.replace(self.cfg, num_classes=num_classes)
        params = dict(params)
        params["head"] = vit.linear_init(key, cfg.decoder_embed_dim, num_classes,
                                         dtype=dtype)
        return RecognitionViT(cfg), params


# ---------------------------------------------------------------------------
# Registry: 12 configs, all ViT-Base trunks (reference tae.py:488-537).
# num_patches tracks the TAE patch-size grid: p16->256 ... p128->4 tokens.
# ---------------------------------------------------------------------------

_GRID: dict[int, tuple[int, ...]] = {
    256: (16, 64, 256),
    64: (64, 256, 1024),
    16: (256, 1024, 4096),
    4: (1024, 4096, 16384),
}


def _make_factory(num_patches: int, vocab: int):
    def factory(num_classes: int | None = None, **overrides) -> RecognitionViT:
        cfg = RecognitionConfig(num_patches=num_patches, vocab_size=vocab,
                                num_classes=num_classes)
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        return RecognitionViT(cfg)

    return factory


for _n, _vs in _GRID.items():
    for _v in _vs:
        register_model(f"vit_recognition_numpatches{_n}_vocab{_v}_base",
                       _make_factory(_n, _v))
