"""LayerNorm with fp32 statistics.

Under torch autocast, LayerNorm always runs in fp32 regardless of the
surrounding half-precision region (this is what the reference relies on at
tae.py:122,125,159,168). We reproduce that numerically: statistics and the
affine transform are computed in fp32, and the result is cast back to the
input dtype.

A fused Pallas implementation lives in :mod:`tae_tpu.ops.pallas.layernorm`;
this module is the XLA fallback and the golden reference for its tests. In
practice XLA already fuses this pattern well, so the fallback is also fast.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6, backend: str | None = None) -> jnp.ndarray:
    from tae_tpu.ops.attention import default_backend

    resolved = backend or default_backend()
    if backend is None and resolved == "pallas":
        rows_env = os.environ.get("TAE_TPU_FLN_ROWS")
        if rows_env is not None:
            # tuning override: dispatch on total row count instead of the
            # measured per-token heuristic
            ok = math.prod(x.shape[:-1]) >= int(rows_env)
        else:
            ok = x.ndim >= 3 and x.shape[-2] >= 128
        if not ok:
            # same shape heuristic as attention (measured on v5e): the fused
            # kernel wins at N>=128 (+4% p16 encode) but breaks XLA's
            # LN-into-matmul fusions at tiny N (-10% p64/p128)
            resolved = "xla"
    if resolved == "pallas" and x.shape[-1] >= 128:
        from tae_tpu.ops.pallas.layernorm import fused_layer_norm

        return fused_layer_norm(x, weight, bias, eps)
    return layer_norm_xla(x, weight, bias, eps)


def layer_norm_xla(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)
