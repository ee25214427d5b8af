"""Fused codebook nearest-neighbor search as a Pallas TPU kernel.

The VQ superset's hot op (BASELINE.json north star: "codebook
nearest-neighbor argmin + straight-through estimator runs as a single fused
kernel"): for latents z (M, V) and codebook C (K, V), find
argmin_k ||z_m − c_k||². The kernel streams codebook blocks through VMEM,
computes ||c_k||² − 2 z·c_k on the MXU, and carries a running (min, argmin)
pair across the K grid dimension — the (M, K) distance matrix never
materializes in HBM. The STE/loss wrapper stays in jnp
(:mod:`tae_tpu.ops.quantizer`), where autodiff already produces the right
codebook/commitment gradients; argmin itself has no gradient.

Falls back to the XLA path for very wide latents (V > 2048) where codebook
blocks would not fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38  # sentinel: larger than any real distance


def _kernel(z_ref, cb_ref, dist_ref, idx_ref, *, block_k: int, k_total: int):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    z = z_ref[:]                                  # (bm, V)
    cb = cb_ref[:]                                # (bk, V)
    cb32 = cb.astype(jnp.float32)
    cbn = jnp.sum(cb32 * cb32, axis=-1)           # (bk,)
    scores = jax.lax.dot_general(                 # (bm, bk)
        z, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    d = cbn[None, :] - 2.0 * scores
    # mask padded codebook rows (last block may exceed k_total)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d = jnp.where(col < k_total, d, _BIG)
    local_min = jnp.min(d, axis=-1, keepdims=True)            # (bm, 1)
    local_arg = jnp.argmin(d, axis=-1)[:, None] + kb * block_k  # (bm, 1)

    better = local_min < dist_ref[:]
    dist_ref[:] = jnp.where(better, local_min, dist_ref[:])
    idx_ref[:] = jnp.where(better, local_arg.astype(jnp.int32), idx_ref[:])


def nearest_code_pallas(z: jnp.ndarray, codebook: jnp.ndarray,
                        block_m: int = 128, block_k: int = 256,
                        interpret: bool = False) -> jnp.ndarray:
    """z: (M, V), codebook: (K, V) -> int32 indices (M,)."""
    m, v = z.shape
    k, _ = codebook.shape
    block_m = min(block_m, m)
    block_k = min(block_k, k)
    grid = (pl.cdiv(m, block_m), pl.cdiv(k, block_k))
    dist, idx = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, v), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, v), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
        ],
        interpret=interpret,
    )(z, codebook)
    del dist
    return idx[:, 0]


def supported(v: int) -> bool:
    return v <= 2048
