"""Parameter initializers matching the reference's PyTorch init semantics.

The reference initializes (reference tae.py:174-194):
  - positional embeddings: ``torch.nn.init.trunc_normal_(std=0.02)`` — note
    torch truncates at the *absolute* bounds a=-2, b=2, which at std=0.02 is
    ±100σ, i.e. effectively an untruncated normal;
  - every ``nn.Linear`` weight (and the patch-embed conv viewed as a linear):
    ``xavier_uniform_`` with gain 1; biases zero;
  - LayerNorm: weight 1, bias 0.

We reproduce those distributions exactly (same fan computation), though not
bit-identical RNG streams (JAX threefry vs torch MT19937 — distributional
equivalence is all the reference's unseeded training relies on anyway,
SURVEY.md §"quirks": fix_random_seeds is never called).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32,
                   fan_in: int | None = None, fan_out: int | None = None) -> jax.Array:
    """Glorot/Xavier uniform for a weight of ``shape`` = (..., fan_in, fan_out).

    For 2-D weights stored (in, out) — our linear convention — the fans match
    torch's (out, in) layout, so the distribution is identical to
    ``torch.nn.init.xavier_uniform_`` on the transposed tensor.
    """
    if fan_in is None:
        fan_in = shape[-2]
    if fan_out is None:
        fan_out = shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def trunc_normal(key: jax.Array, shape: tuple[int, ...], std: float = 0.02,
                 mean: float = 0.0, a: float = -2.0, b: float = 2.0,
                 dtype=jnp.float32) -> jax.Array:
    """``torch.nn.init.trunc_normal_`` semantics: a/b are absolute bounds.

    jax.random.truncated_normal takes bounds in σ units, so convert.
    """
    lo = (a - mean) / std
    hi = (b - mean) / std
    return mean + std * jax.random.truncated_normal(key, lo, hi, shape, dtype)


def zeros(shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype)
