"""High-level tokenizer API — the serving-side face of the framework.

The reference exposes tokenization only through the encode.py script
(reference encode.py:76-91). For production/serving use, ``Tokenizer`` wraps
a trained TAE behind three jitted methods:

    tok = Tokenizer.from_checkpoint("tae_patch16_vocab256_px256", ckpt_path)
    z   = tok.encode(images)        # (B, N, vocab) bf16 latents
    rec = tok.decode(z)             # (B, 3, H, W) reconstructions
    ids = tok.encode_discrete(z_or_images)   # VQ superset: int32 token ids

Inputs are normalized (C, H, W) float batches (the data layer's output); the
``encode_jpeg`` convenience runs the native decode path for raw bytes.
Parameters are held in the compute dtype (bf16 by default) so serving never
re-casts per call.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tae_tpu.utils.dtypes import Policy

Params = Any


def prune_component(params: Params, component: str) -> Params:
    """Drop the unused half of a TAE param tree: ``component="encoder"``
    removes the decoder sub-tree (encode-only serving — halves resident
    weight HBM for the 3.4-4B configs), ``"decoder"`` the encoder,
    ``"both"`` keeps everything. The shared codebook (VQ superset) is
    always kept."""
    if component == "both":
        return params
    if component not in ("encoder", "decoder"):
        raise ValueError(f"unknown component {component!r}")
    drop = "decoder" if component == "encoder" else "encoder"
    return {k: v for k, v in params.items() if k != drop}


@dataclasses.dataclass
class Tokenizer:
    model: Any                      # tae_tpu.models.tae.TAE
    params: Params
    policy: Policy
    _encode = None
    _decode = None

    @classmethod
    def from_checkpoint(cls, model_name: str, ckpt: str | None = None,
                        dtype=jnp.bfloat16, mesh=None,
                        quantization: str | None = None,
                        component: str = "both",
                        equalize: float | bool | None = None,
                        act_amax=None, calib_images=None,
                        patch_input: bool = False,
                        **model_overrides) -> "Tokenizer":
        """``quantization="int8"`` rewrites all linear weights to int8 with
        per-channel scales (w8a8 dynamic serving path, ~2x MXU rate; see
        tae_tpu.ops.int8). ``quantization="int4"`` packs the transformer-block
        weights to int4 with group scales (w4a8 — half the weight bytes, for
        the weight-streaming-bound small-batch regime; coarser code, see
        tae_tpu.ops.int4 for the accuracy trade).

        ``component``: "both" (default), "encoder" or "decoder" — prune the
        unused half after loading. An encode-only deployment of the 3.4-4B
        configs halves resident weight HBM (and the serving artifact), which
        compounds with int8/int4; calling the pruned direction raises.

        ``equalize``: SmoothQuant-style activation-outlier equalization
        before quantization (``True`` → alpha 0.5, or pass the alpha) — an
        exact float rewrite folding per-channel factors into the LN affines,
        so outlier channels stop dominating the per-row activation scales
        (see :func:`tae_tpu.ops.int8.equalize_params`). Only meaningful with
        ``quantization`` set. By default the per-channel activation ranges
        are estimated from the LN affines; pass measured stats via
        ``act_amax`` (a :func:`tae_tpu.calibrate.ln_amax` tree) or let
        ``calib_images`` — an iterable of image batches — run that
        calibration here on the float params before quantizing.

        ``patch_input=True``: declare that encode calls will feed
        pre-patchified (B, N, C*p*p) batches (the native decoder's
        ``--patch_layout``); int8 mode then quantizes the patch embed too
        (+6% p64 encode — see :func:`tae_tpu.ops.int8.prepare_serving_params`).
        Image-layout calls still work, just without that win."""
        from tae_tpu import models
        from tae_tpu.ckpt.io import load_params

        model = models.create(model_name, **model_overrides)
        params = jax.jit(lambda k: model.init(k, dtype=dtype))(jax.random.key(0))
        if mesh is not None:
            from tae_tpu.parallel import shard_params

            params = shard_params(params, mesh)
        if ckpt:
            params = load_params(ckpt, model, params)
        params = jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
            else x, params)
        # prune before quantization so the quantize pass never materializes
        # copies of the dropped half
        params = prune_component(params, component)
        if (act_amax is not None or calib_images is not None) and not equalize:
            raise ValueError("act_amax/calib_images require equalize= "
                             "(they feed the equalization rewrite)")
        if equalize and quantization not in ("int8", "int4"):
            raise ValueError("equalize= only applies to the quantized "
                             "serving modes (it rewrites ranges the bf16 "
                             "path never quantizes)")
        if quantization is not None:
            from tae_tpu.ops.int8 import prepare_serving_params

            if equalize and calib_images is not None and act_amax is None:
                from tae_tpu.calibrate import ln_amax

                act_amax = ln_amax(model, params, calib_images)
            # equalize -> quantize -> unstacked serving layout (the layout
            # kills the per-layer dynamic-slice copies Pallas can't alias —
            # measured +10-16% encode; see docs/KERNELS.md)
            params = prepare_serving_params(params, quantization,
                                            equalize or 0.0, act_amax,
                                            patch_input=patch_input)
        return cls(model=model, params=params,
                   policy=Policy(param_dtype=dtype, compute_dtype=dtype))

    def __post_init__(self):
        m, pol = self.model, self.policy

        def enc(p, x):
            # uint8 inputs (native decode_batch_u8 path, CHW or
            # pre-patchified) are normalized on device — 4x smaller H2D
            # copies, and XLA fuses the normalize into the patch-embed read
            from tae_tpu.data.transforms import maybe_device_normalize

            x = maybe_device_normalize(x, m.cfg.patch_size, pol.compute_dtype)
            # serving=True: Tokenizer is a pure-inference surface, so the
            # clamped constant-shift softmax kernels are safe here (+2% p16
            # bf16 encode, r2d); parity/training paths keep the exact form
            return m.forward_encoder(p, x, policy=pol, serving=True)

        self._encode = jax.jit(enc)
        self._decode = jax.jit(
            lambda p, z: m.unpatchify(m.forward_decoder(p, z, policy=pol,
                                                        serving=True)))

    # ------------------------------------------------------------------ api
    def encode(self, images) -> jax.Array:
        """(B, 3, H, W) -> (B, N, vocab) latents. Accepts normalized float
        batches (the data layer's default) or raw uint8 pixel batches
        (normalized on device)."""
        if "encoder" not in self.params:
            raise ValueError("encoder was pruned (component='decoder')")
        return self._encode(self.params, jnp.asarray(images))

    def decode(self, latents) -> jax.Array:
        """(B, N, vocab) latents -> (B, 3, H, W) reconstructions."""
        if "decoder" not in self.params:
            raise ValueError("decoder was pruned (component='encoder')")
        return self._decode(self.params, jnp.asarray(latents))

    def reconstruct(self, images) -> jax.Array:
        return self.decode(self.encode(images))

    def encode_discrete(self, images_or_latents) -> jax.Array:
        """VQ superset: nearest-codebook token ids (requires quantize=True
        config, which adds the codebook parameter)."""
        if "codebook" not in self.params:
            raise ValueError("model has no codebook; build with quantize=True")
        x = jnp.asarray(images_or_latents)
        z = self.encode(x) if x.ndim == 4 else x
        from tae_tpu.ops.quantizer import nearest_code

        return nearest_code(z, self.params["codebook"])

    def decode_discrete(self, ids) -> jax.Array:
        if "codebook" not in self.params:
            raise ValueError("model has no codebook; build with quantize=True")
        z = self.params["codebook"][jnp.asarray(ids)]
        return self.decode(z)

    # ------------------------------------------------------- serving artifact
    def save_serving(self, path: str) -> None:
        """Persist the (possibly int8-quantized, unstacked) serving params so
        deployment skips checkpoint-load + quantization at startup —
        quantize once, ship the artifact."""
        from tae_tpu.ckpt.io import save_checkpoint

        save_checkpoint(path, self.params,
                        extra={"serving": True,
                               "compute_dtype": str(
                                   jnp.dtype(self.policy.compute_dtype))})

    @classmethod
    def from_serving(cls, model_name: str, path: str, dtype=None,
                     component: str = "both", **model_overrides) -> "Tokenizer":
        """Load a :meth:`save_serving` artifact (no re-quantization).

        ``dtype=None`` (default) restores the compute dtype recorded by
        :meth:`save_serving`, so the restored tokenizer reproduces the
        numerics the artifact was validated under; pass a dtype explicitly
        to override."""
        from tae_tpu import models
        from tae_tpu.ckpt.io import load_checkpoint

        model = models.create(model_name, **model_overrides)
        params, meta = load_checkpoint(path)
        if not meta.get("serving"):
            raise ValueError(f"{path!r} is not a serving artifact "
                             "(use from_checkpoint for training checkpoints)")
        if dtype is None:
            dtype = jnp.dtype(meta.get("compute_dtype", "bfloat16"))
        params = prune_component(params, component)
        return cls(model=model, params=params,
                   policy=Policy(param_dtype=dtype, compute_dtype=dtype))

    def encode_jpeg(self, jpegs: Sequence[bytes], deterministic: bool = True
                    ) -> jax.Array:
        """Raw JPEG bytes -> latents via the native (or PIL) val transform."""
        from tae_tpu.data import native
        from tae_tpu.data.transforms import center_crop_transform

        size = self.model.cfg.img_size
        if native.available():
            arrs = [native.center_crop(b, size) for b in jpegs]
        else:
            import io

            from PIL import Image

            tf = center_crop_transform(size)
            arrs = [tf(Image.open(io.BytesIO(b)).convert("RGB")) for b in jpegs]
        return self.encode(np.stack(arrs))
