"""VQ bottleneck: codebook nearest-neighbor + straight-through estimator.

This is a *superset* feature: the reference's forward path is fully continuous
(no argmax/one-hot/STE exists anywhere in reference tae.py:224-271; the only
hint is an unimplemented "softmax estimation" comment at train.py:130). It is
off by default (``TAEConfig.quantize=False``) and enabling it does not change
any default behavior.

The distance argmin is formulated as a single matmul: for latent z and
codebook C, ``argmin_k ||z - c_k||² = argmin_k (||c_k||² - 2 z·c_k)`` — the
z² term is constant in k. That keeps the heavy part on the MXU; a fused
Pallas kernel (:mod:`tae_tpu.ops.pallas.quantizer`) additionally fuses the
argmin+gather for large codebooks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_code_xla(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """XLA reference path: materializes the (..., K) distance matrix."""
    z32 = z.astype(jnp.float32)
    cb32 = codebook.astype(jnp.float32)
    # ||c_k||^2 - 2 z . c_k   (drop the z^2 term; constant per row)
    dist = jnp.sum(cb32 * cb32, axis=-1) - 2.0 * jnp.einsum(
        "...v,kv->...k", z32, cb32, preferred_element_type=jnp.float32)
    return jnp.argmin(dist, axis=-1)


def nearest_code(z: jnp.ndarray, codebook: jnp.ndarray,
                 backend: str | None = None) -> jnp.ndarray:
    """Indices of nearest codebook entries. z: (..., V), codebook: (K, V).

    Dispatches to the fused Pallas kernel on TPU (codebook streamed through
    VMEM, no (M, K) matrix in HBM) and the XLA path elsewhere / for very
    wide latents.
    """
    from tae_tpu.ops.attention import default_backend

    backend = backend or default_backend()
    if backend == "pallas":
        from tae_tpu.ops.pallas.quantizer import nearest_code_pallas, supported

        if supported(z.shape[-1]):
            lead = z.shape[:-1]
            z2d = z.reshape(-1, z.shape[-1])
            return nearest_code_pallas(z2d, codebook).reshape(lead)
    return nearest_code_xla(z, codebook)


def vq_ste(z: jnp.ndarray, codebook: jnp.ndarray, beta: float = 0.25
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize z to its nearest codes with a straight-through gradient.

    Returns (z_q, aux_loss) where aux_loss = codebook loss + β · commitment
    loss (standard VQ-VAE objective). z_q carries dz/dz = identity via STE.
    """
    idx = nearest_code(z, codebook)
    zq = codebook[idx].astype(z.dtype)
    z32, zq32 = z.astype(jnp.float32), zq.astype(jnp.float32)
    codebook_loss = jnp.mean(jnp.square(zq32 - jax.lax.stop_gradient(z32)))
    commit_loss = jnp.mean(jnp.square(z32 - jax.lax.stop_gradient(zq32)))
    aux = codebook_loss + beta * commit_loss
    # straight-through: forward zq, backward identity to z
    z_ste = z + jax.lax.stop_gradient(zq - z)
    return z_ste, aux


def encode_indices(z: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Discrete token ids for a latent batch — the tokenizer-serving path."""
    return nearest_code(z, codebook)


def decode_indices(idx: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    return codebook[idx]
