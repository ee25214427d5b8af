"""Tiled w4a8 matmul with group-wise dequantization (Pallas TPU).

Weight bytes are the whole game here: this kernel exists for the
weight-streaming-bound serving regime (small batch × 2.5-4B configs) where
the int8 path is already HBM-limited. Packed int4 halves the streamed bytes;
the extra VPU work (nibble unpack + per-group fp32 rescale) hides under the
weight DMA at those shapes.

Layout (see :mod:`tae_tpu.ops.int4`): ``w4`` is (K/2, N) int8 bytes in
nibble-plane order — byte row r = (w[r] lo, w[r + K/2] hi) — and ``w_scale``
is (K/G, N) fp32 with plane-aligned groups. The grid's K dimension walks
byte blocks of exactly one group (bkb = G): each step unpacks its block once
and runs TWO plane-local int8 MXU dots (x rows [kb·G, ..) against the lo
plane, x rows [K/2 + kb·G, ..) against hi), accumulating
``Σ_g ig_g · s_g`` in an fp32 scratch — exact, because a group partial is
≤ 128·127·7 < 2^24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tae_tpu.ops.int8 import vmem_limit as _vmem_limit


def _unpack(b32):
    # offset-8 byte layout (tae_tpu.ops.int4): b = 16·hi + (lo + 8), decoded
    # from the SIGN-extended byte — the arithmetic shift is an exact floor
    # division because the low-nibble remainder is in [1, 15]
    lo = (b32 & 15) - 8
    hi = b32 >> 4
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, sx_ref, b_ref,
            res_ref, o_ref, acc_ref, *, n_k: int, has_bias: bool,
            has_residual: bool):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack(w_ref[:].astype(jnp.int32))
    ig_lo = jax.lax.dot_general(xlo_ref[:], lo, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    ig_hi = jax.lax.dot_general(xhi_ref[:], hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    # scale refs are (1, 1, bn) blocks (group in the leading block dim —
    # Mosaic forbids size-1 sublane blocks, see the wrapper's reshape)
    acc_ref[:] += (ig_lo.astype(jnp.float32) * slo_ref[0]
                   + ig_hi.astype(jnp.float32) * shi_ref[0])

    @pl.when(kb == n_k - 1)
    def _():
        y = acc_ref[:] * sx_ref[:]
        if has_bias:
            y = y + b_ref[:].astype(jnp.float32)
        if has_residual:
            y = y + res_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


def int4_matmul_fused(x: jnp.ndarray, w4: jnp.ndarray, w_scale: jnp.ndarray,
                      bias: jnp.ndarray | None = None,
                      block_m: int = 256, block_n: int = 512,
                      out_dtype=None,
                      x_scale: jnp.ndarray | None = None,
                      residual: jnp.ndarray | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """x (M, K) float or int8, w4 (K/2, N) packed, w_scale (K/G, N) -> (M, N).

    ``x_scale`` (M, 1): per-row scales for already-int8 x (ln_quant / q8
    attention outputs); otherwise x is quantized by one XLA pass here.
    ``residual`` (M, N) is added in the epilogue. M and N must tile into the
    blocks (callers pad; :func:`tae_tpu.ops.int4.int4_linear` handles it).
    """
    m, k = x.shape
    half, n = w4.shape
    if half * 2 != k:
        raise ValueError(f"packed weight rows {half} != K/2 = {k // 2}")
    n_groups = w_scale.shape[0]
    if n_groups % 2:
        raise ValueError("group count must be even (plane-aligned groups)")
    n_k = n_groups // 2          # byte blocks == groups per plane
    g = half // n_k
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    if m % block_m or n % block_n or half % n_k:
        raise ValueError(f"shape ({m},{k})x({k},{n}) g={g} not divisible by "
                         f"blocks ({block_m},{block_n})")

    if x_scale is not None:
        assert x.dtype == jnp.int8, "x_scale requires already-quantized x"
        out_dtype = out_dtype or jnp.bfloat16
        xq, sx = x, x_scale
    else:
        out_dtype = out_dtype or x.dtype
        # reduce |x| in the input dtype, and barrier the quantize's own
        # convert so it can't CSE-merge with the reduce's — merged, XLA
        # materializes the full f32 activation as a fusion output (see
        # int8_matmul.py for the profile; both halves are the fix)
        sx = jnp.maximum(
            jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32)
            / 127.0, 1e-12)
        xb = jax.lax.optimization_barrier(x)
        xq = jnp.clip(jnp.round(xb.astype(jnp.float32) / sx),
                      -127.0, 127.0).astype(jnp.int8)

    has_bias = bias is not None
    b_arg = bias.reshape(1, n) if has_bias else jnp.zeros((1, n), jnp.float32)
    has_residual = residual is not None
    res_arg = residual if has_residual else jnp.zeros((1, n), jnp.float32)
    res_bm = block_m if has_residual else 1
    res_map = (lambda i, j, kk: (i, j)) if has_residual \
        else (lambda i, j, kk: (0, j))

    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, has_bias=has_bias,
                          has_residual=has_residual),
        grid=(m // block_m, n // block_n, n_k),
        in_specs=[
            # x lo-plane rows [kk·g, ..) and hi-plane rows [K/2 + kk·g, ..)
            pl.BlockSpec((block_m, g), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, g), lambda i, j, kk, _nk=n_k: (i, kk + _nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((res_bm, block_n), res_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(xq, xq, w4,
      w_scale[:n_k].reshape(n_k, 1, n), w_scale[n_k:].reshape(n_k, 1, n),
      sx, b_arg.astype(jnp.float32), res_arg)
