"""Patch extraction / reassembly as pure reshape+transpose (MXU-friendly).

The reference implements patch embedding as a strided cuDNN conv with
kernel=stride=patch (reference tae.py:43,50) and the loss-target patchify as an
einsum (reference tae.py:196-208). On TPU a stride=kernel conv is exactly a
reshape+matmul; lowering it that way lets XLA tile one big (B·N, p²·3)×(p²·3,E)
matmul onto the MXU instead of going through a conv op.

Two pixel orders appear, mirroring the reference:
  * ``extract_patches`` flattens each patch channel-major (c, p, q) — the same
    order as a torch Conv2d weight ``(E, C, p, p)``, so imported checkpoints
    only need a reshape+transpose.
  * ``patchify`` flattens pixel-major (p, q, c) — the order used by the
    reconstruction target and decoder prediction (reference tae.py:205-207).
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, N, C*p*p), per-patch layout (c, p, q)."""
    b, c, h, w = imgs.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = imgs.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, C, p, p)
    return x.reshape(b, gh * gw, c * p * p)


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, N, p*p*C), per-patch layout (p, q, c).

    Bit-for-bit the ordering of reference tae.py:196-208
    (einsum nchpwq->nhwpqc).
    """
    b, c, h, w = imgs.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = imgs.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # (B, gh, gw, p, q, c)
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int = 3) -> jnp.ndarray:
    """(B, N, p*p*C) -> (B, C, H, W). Inverse of :func:`patchify`.

    Matches reference tae.py:210-222 (and the segmentation variant
    tae.py:391-403, which only differs in the channel count).
    """
    b, n, _ = x.shape
    p = patch_size
    gh = gw = int(round(n ** 0.5))
    if gh * gw != n:
        raise ValueError(f"token count {n} is not a square grid")
    x = x.reshape(b, gh, gw, p, p, channels)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # (B, C, gh, p, gw, q)
    return x.reshape(b, channels, gh * p, gw * p)
