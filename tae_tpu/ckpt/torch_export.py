"""Export tae_tpu param pytrees as PyTorch reference checkpoints.

Exact inverse of :mod:`tae_tpu.ckpt.torch_import` — the emitted state_dict
loads into the reference model classes with ``strict=True`` (reference
tae.py:133-172 TAE, :274-298 VITForRecognition, :341-372 VITForSegmentation),
so checkpoints trained here can be handed back to PyTorch consumers of the
reference ecosystem:

  * ours Linear ``{w: (in, out), b}`` -> torch ``weight (out, in)`` / ``bias``;
  * patch-embed matmul weight ``(C·p², E)`` -> Conv2d weight ``(E, C, p, p)``;
  * LayerNorm ``{scale, bias}`` -> ``weight`` / ``bias``;
  * depth-stacked block arrays -> per-layer ``blocks.{i}.*`` entries.

``save_torch_checkpoint`` wraps the state_dict in the reference's on-disk
dict shape ``{"model", "args", "iteration"}`` (reference train.py:163-171).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = dict[str, Any]


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def _linear(out: dict, prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _t(p["w"]).T.contiguous()
    if "b" in p:
        out[f"{prefix}.bias"] = _t(p["b"])


def _layer_norm(out: dict, prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _t(p["scale"])
    out[f"{prefix}.bias"] = _t(p["bias"])


def _stacked_blocks(out: dict, prefix: str, blocks: Params) -> None:
    depth = int(np.asarray(blocks["norm1"]["scale"]).shape[0])
    for i in range(depth):
        layer = _tree_index(blocks, i)
        b = f"{prefix}.{i}"
        _layer_norm(out, f"{b}.norm1", layer["norm1"])
        _linear(out, f"{b}.attn.qkv", layer["attn"]["qkv"])
        if "q_norm" in layer["attn"]:  # qk_norm=True (reference tae.py:68-69)
            _layer_norm(out, f"{b}.attn.q_norm", layer["attn"]["q_norm"])
            _layer_norm(out, f"{b}.attn.k_norm", layer["attn"]["k_norm"])
        _linear(out, f"{b}.attn.proj", layer["attn"]["proj"])
        _layer_norm(out, f"{b}.norm2", layer["norm2"])
        _linear(out, f"{b}.mlp.fc1", layer["mlp"]["fc1"])
        _linear(out, f"{b}.mlp.fc2", layer["mlp"]["fc2"])


def _tree_index(tree: Params, i: int) -> Params:
    return {k: _tree_index(v, i) if isinstance(v, dict) else np.asarray(v)[i]
            for k, v in tree.items()}


def _patch_embed(out: dict, prefix: str, p: Mapping[str, Any],
                 patch: int, in_chans: int = 3) -> None:
    w = np.asarray(p["w"], dtype=np.float32)          # (C·p², E)
    e = w.shape[1]
    out[f"{prefix}.weight"] = _t(w.T.reshape(e, in_chans, patch, patch))
    out[f"{prefix}.bias"] = _t(p["b"])


def tae_state_dict(params: Params, cfg) -> dict:
    """Our TAE param tree -> reference TAE state_dict (tae.py:133-172)."""
    sd: dict = {}
    enc, dec = params["encoder"], params["decoder"]
    _patch_embed(sd, "patch_embed.proj", enc["patch_embed"], cfg.patch_size)
    sd["pos_embed"] = _t(enc["pos_embed"])
    _stacked_blocks(sd, "blocks", enc["blocks"])
    _layer_norm(sd, "norm", enc["norm"])
    _linear(sd, "dict_proj", enc["dict_proj"])
    _linear(sd, "decoder_embed", dec["embed"])
    sd["decoder_pos_embed"] = _t(dec["pos_embed"])
    _stacked_blocks(sd, "decoder_blocks", dec["blocks"])
    _layer_norm(sd, "decoder_norm", dec["norm"])
    _linear(sd, "decoder_pred", dec["pred"])
    return sd


def recognition_state_dict(params: Params, cfg) -> dict:
    """Our RecognitionViT tree -> reference VITForRecognition state_dict."""
    sd: dict = {}
    _linear(sd, "decoder_embed", params["embed"])
    sd["decoder_pos_embed"] = _t(params["pos_embed"])
    _stacked_blocks(sd, "decoder_blocks", params["blocks"])
    _layer_norm(sd, "decoder_norm", params["norm"])
    if "head" in params:
        _linear(sd, "head", params["head"])
    return sd


def segmentation_state_dict(params: Params, cfg) -> dict:
    """Our SegmentationViT tree -> reference VITForSegmentation state_dict."""
    sd: dict = {}
    _linear(sd, "decoder_embed", params["embed"])
    sd["decoder_pos_embed"] = _t(params["pos_embed"])
    _stacked_blocks(sd, "decoder_blocks", params["blocks"])
    _layer_norm(sd, "decoder_norm", params["norm"])
    _layer_norm(sd, "aux_decoder_norm", params["aux_norm"])
    _linear(sd, "head", params["head"])
    _linear(sd, "aux_head", params["aux_head"])
    return sd


def state_dict_for(model, params: Params) -> dict:
    """Dispatch on model type (mirrors ckpt.io.load_params's import side)."""
    from tae_tpu.models.recognition import RecognitionViT
    from tae_tpu.models.segmentation import SegmentationViT
    from tae_tpu.models.tae import TAE

    import jax

    params = jax.tree.map(np.asarray, params)
    if isinstance(model, TAE):
        return tae_state_dict(params, model.cfg)
    if isinstance(model, RecognitionViT):
        return recognition_state_dict(params, model.cfg)
    if isinstance(model, SegmentationViT):
        return segmentation_state_dict(params, model.cfg)
    raise TypeError(f"cannot export torch checkpoint for {type(model)}")


def save_torch_checkpoint(path, model, params: Params, args: Any = None,
                          step: int | None = None) -> None:
    """Write the reference's checkpoint dict shape (train.py:163-171)."""
    import torch

    from tae_tpu.ckpt.io import asdict_args

    blob: dict = {"model": state_dict_for(model, params)}
    if args is not None:
        blob["args"] = asdict_args(args)
    if step is not None:
        blob["iteration"] = int(step)
    torch.save(blob, path)
