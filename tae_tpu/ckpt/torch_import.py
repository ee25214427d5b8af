"""Import PyTorch reference checkpoints into tae_tpu param pytrees.

Layout translation rules (see tae_tpu/nn/vit.py conventions):
  * torch Linear weight (out, in)  ->  ours (in, out): transpose.
  * patch-embed Conv2d weight (E, C, p, p) -> (C·p², E): flatten + transpose
    (our ``extract_patches`` emits channel-major (c, p, q) patch vectors, so
    the flattened conv weight applies directly).
  * torch LayerNorm weight/bias -> scale/bias.
  * per-layer ``blocks.{i}.*`` entries -> depth-stacked arrays (np.stack).

This module exists for parity testing against the reference and for users
migrating trained reference checkpoints (reference train.py:163-171 saves a
``{"model": state_dict, ...}`` dict; pass ``state_dict`` here).

Accepts torch tensors or numpy arrays; torch is only imported lazily.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = dict[str, Any]


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (cpu): detach->numpy without importing torch at module scope
    return x.detach().cpu().float().numpy()


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> Params:
    p: Params = {"w": _np(sd[f"{prefix}.weight"]).T.copy()}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _layer_norm(sd: Mapping[str, Any], prefix: str) -> Params:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _stacked_blocks(sd: Mapping[str, Any], prefix: str, depth: int) -> Params:
    """Convert ``{prefix}.{i}.*`` per-layer entries to depth-stacked arrays."""
    layers = []
    for i in range(depth):
        b = f"{prefix}.{i}"
        attn: Params = {
            "qkv": _linear(sd, f"{b}.attn.qkv"),
            "proj": _linear(sd, f"{b}.attn.proj"),
        }
        if f"{b}.attn.q_norm.weight" in sd:  # qk_norm=True (tae.py:68-69)
            attn["q_norm"] = _layer_norm(sd, f"{b}.attn.q_norm")
            attn["k_norm"] = _layer_norm(sd, f"{b}.attn.k_norm")
        layers.append({
            "norm1": _layer_norm(sd, f"{b}.norm1"),
            "attn": attn,
            "norm2": _layer_norm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        })
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def _patch_embed(sd: Mapping[str, Any], prefix: str) -> Params:
    w = _np(sd[f"{prefix}.weight"])            # (E, C, p, p)
    e = w.shape[0]
    return {
        "w": w.reshape(e, -1).T.copy(),        # (C·p², E)
        "b": _np(sd[f"{prefix}.bias"]),
    }


def tae_params_from_torch(sd: Mapping[str, Any], cfg) -> Params:
    """Reference TAE state_dict (reference tae.py:133-172) -> our param tree."""
    return {
        "encoder": {
            "patch_embed": _patch_embed(sd, "patch_embed.proj"),
            "pos_embed": _np(sd["pos_embed"]),
            "blocks": _stacked_blocks(sd, "blocks", cfg.depth),
            "norm": _layer_norm(sd, "norm"),
            "dict_proj": _linear(sd, "dict_proj", bias=False),
        },
        "decoder": {
            "embed": _linear(sd, "decoder_embed"),
            "pos_embed": _np(sd["decoder_pos_embed"]),
            "blocks": _stacked_blocks(sd, "decoder_blocks", cfg.decoder_depth),
            "norm": _layer_norm(sd, "decoder_norm"),
            "pred": _linear(sd, "decoder_pred"),
        },
    }


def recognition_params_from_torch(sd: Mapping[str, Any], cfg) -> Params:
    """Reference VITForRecognition state_dict (tae.py:274-298) -> param tree."""
    p: Params = {
        "embed": _linear(sd, "decoder_embed"),
        "pos_embed": _np(sd["decoder_pos_embed"]),
        "blocks": _stacked_blocks(sd, "decoder_blocks", cfg.decoder_depth),
        "norm": _layer_norm(sd, "decoder_norm"),
    }
    if "head.weight" in sd:
        p["head"] = _linear(sd, "head")
    return p


def segmentation_params_from_torch(sd: Mapping[str, Any], cfg) -> Params:
    """Reference VITForSegmentation state_dict (tae.py:341-372) -> param tree."""
    return {
        "embed": _linear(sd, "decoder_embed"),
        "pos_embed": _np(sd["decoder_pos_embed"]),
        "blocks": _stacked_blocks(sd, "decoder_blocks", cfg.decoder_depth),
        "norm": _layer_norm(sd, "decoder_norm"),
        "aux_norm": _layer_norm(sd, "aux_decoder_norm"),
        "head": _linear(sd, "head"),
        "aux_head": _linear(sd, "aux_head"),
    }
