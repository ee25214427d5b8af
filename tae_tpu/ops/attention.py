"""Multi-head scaled-dot-product attention with pluggable backends.

The reference calls ``F.scaled_dot_product_attention`` (flash-attention-2 on
CUDA, reference tae.py:78). Here the hot path is a Pallas TPU kernel
(:mod:`tae_tpu.ops.pallas.flash_attention`); ``backend="xla"`` is the plain
jnp reference used on CPU, in tests, and as the small-N fallback.

Shape regime note (SURVEY.md §3.5): sequence length is tiny (N ∈ {4..256})
while head counts/dims are large, so the whole attention matrix fits in VMEM
and a single-block online-softmax kernel is the right shape — blockwise
streaming over N would be pure overhead.

Backend selection: explicit argument > ``TAE_TPU_ATTN`` env var > automatic
("pallas" on TPU devices, "xla" elsewhere).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def default_backend() -> str:
    """Resolve the backend at every call: the ``TAE_TPU_ATTN`` env var is
    read live (so platform-switching entry points set it after import), and
    only the device probe is cached (it latches the platform — entry points
    that force a different platform must call
    ``_platform_backend.cache_clear()`` or set the env var)."""
    env = os.environ.get("TAE_TPU_ATTN", "").strip().lower()
    if env in ("pallas", "xla"):
        return env
    return _platform_backend()


@functools.cache
def _platform_backend() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices at all
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale: float | None = None) -> jnp.ndarray:
    """Reference attention. q, k, v: (B, H, N, dh) -> (B, H, N, dh).

    Matches torch F.scaled_dot_product_attention semantics (no mask, no
    dropout, default scale 1/sqrt(dh)); softmax statistics in fp32.
    """
    *_, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: float | None = None, backend: str | None = None) -> jnp.ndarray:
    """Dispatch to the configured attention backend."""
    backend = backend or default_backend()
    if backend == "xla":
        return attention_xla(q, k, v, scale)
    if backend == "pallas":
        from tae_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    raise ValueError(f"unknown attention backend: {backend!r}")
