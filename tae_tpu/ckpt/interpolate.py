"""Bicubic positional-embedding interpolation for resolution transfer.

Equivalent of the reference's ``interpolate_pos_embed``
(util/misc.py:326-350), which calls torch ``interpolate(mode="bicubic",
align_corners=False)``. We reproduce torch's kernel exactly — cubic
convolution with A = −0.75, half-pixel-centered source coordinates, edge
clamping — as two separable resize matrices, so a transferred checkpoint
produces the same embeddings it would under the reference. (NB:
``jax.image.resize``'s cubic uses A = −0.5 and differs by up to ~20% on
unit-scale data, which is why we don't use it.)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution weights for the 4 taps around fractional offset t.
    Same polynomial torch's upsampling kernels use (cubic_convolution1/2)."""
    w0 = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w1 = ((a + 2) * t - (a + 3)) * t * t + 1
    s = 1 - t
    w2 = ((a + 2) * s - (a + 3)) * s * s + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)  # (new, 4)


def _resize_matrix(old: int, new: int) -> np.ndarray:
    """(new, old) matrix implementing 1-D bicubic resize, torch semantics
    (align_corners=False: src = (i + 0.5)·old/new − 0.5; edges clamped)."""
    i = np.arange(new, dtype=np.float64)
    src = (i + 0.5) * (old / new) - 0.5
    x0 = np.floor(src)
    t = src - x0
    weights = _cubic_weights(t)                        # (new, 4)
    mat = np.zeros((new, old), dtype=np.float64)
    for tap in range(4):
        idx = np.clip(x0.astype(np.int64) - 1 + tap, 0, old - 1)
        np.add.at(mat, (np.arange(new), idx), weights[:, tap])
    return mat.astype(np.float32)


def interpolate_pos_embed(pos: jnp.ndarray, new_num_patches: int) -> jnp.ndarray:
    """pos: (1, N_old, E) -> (1, new_num_patches, E)."""
    _, n_old, e = pos.shape
    if n_old == new_num_patches:
        return pos
    old = int(math.isqrt(n_old))
    new = int(math.isqrt(new_num_patches))
    if old * old != n_old or new * new != new_num_patches:
        raise ValueError(f"pos-embed grids must be square: {n_old} -> {new_num_patches}")
    grid = pos.reshape(old, old, e).astype(jnp.float32)
    m = jnp.asarray(_resize_matrix(old, new))
    # rows then columns (separable): (new, old)@(old, old, E) twice
    grid = jnp.einsum("ij,jke->ike", m, grid)
    grid = jnp.einsum("kj,ije->ike", m, grid)
    return grid.reshape(1, new * new, e).astype(pos.dtype)


def maybe_interpolate_tree(params, model_params) -> dict:
    """Walk a restored param tree and resize any ``pos_embed`` leaf whose
    token count differs from the model's (applied on load, like reference
    util/misc.py:314-315)."""
    def walk(loaded, target):
        out = {}
        for k, v in loaded.items():
            t = target.get(k) if isinstance(target, dict) else None
            if isinstance(v, dict):
                out[k] = walk(v, t or {})
            elif k == "pos_embed" and t is not None and v.shape != t.shape:
                out[k] = interpolate_pos_embed(jnp.asarray(v), t.shape[-2])
            else:
                out[k] = v
        return out

    return walk(params, model_params)
