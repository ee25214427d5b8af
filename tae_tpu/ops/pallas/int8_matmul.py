"""Tiled int8 matmul with fused activation quantization (Pallas TPU).

The plain-XLA w8a8 path gains nothing over bf16 (measured on v5e: int8
dot_general alone runs at 308 TOP/s vs 174 TFLOP/s bf16, but the unfused
quantize/rescale elementwise passes burn the ~1.8x right back). This kernel
removes every extra HBM pass:

  * activations stream in as bf16 and are quantized to int8 *in VMEM*
    (per-row scales are a scalar-prefetch-style side input computed by one
    cheap XLA reduce);
  * weights stream as int8 (half the HBM traffic of bf16 weights — also
    helps the weight-streaming-bound p128 config);
  * int32 accumulation over K blocks in scratch; the epilogue applies
    sx·sw (+bias) and writes bf16 once.

Grid (M/bm, N/bn, K/bk), K minor — the standard revisiting-accumulator
matmul pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tae_tpu.ops.int8 import vmem_limit as _vmem_limit


def _kernel(x_ref, w_ref, sx_ref, sw_ref, b_ref, res_ref, o_ref, acc_ref, *,
            n_k: int, has_bias: bool, has_residual: bool,
            quantize_in_kernel: bool, q8_out: bool = False, so_ref=None,
            ln_eps: float | None = None, g_ref=None, be_ref=None,
            nq_ref=None, ns_ref=None):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if quantize_in_kernel:
        x = x_ref[:].astype(jnp.float32)           # (bm, bk) bf16 -> f32
        inv = pl.reciprocal(sx_ref[:], approx=False)
        xq = jnp.clip(jnp.round(x * inv), -127.0, 127.0).astype(jnp.int8)
    else:
        xq = x_ref[:]                              # already int8
    acc_ref[:] += jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(kb == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        if has_bias:
            y = y + b_ref[:].astype(jnp.float32)
        if has_residual:
            y = y + res_ref[:].astype(jnp.float32)
        if q8_out:
            # int8 output with one scale per (row, n-block): the consumer
            # dequantizes in VMEM — the bf16 round-trip this deletes was
            # the qkv activation write+read (~38% of p16 int8 layer bytes)
            s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True)
                            / 127.0, 1e-12)
            o_ref[:] = jnp.clip(jnp.round(y * pl.reciprocal(s, approx=False)),
                                -127.0, 127.0).astype(jnp.int8)
            so_ref[0] = s
        else:
            o_ref[:] = y.astype(o_ref.dtype)
            if ln_eps is not None:
                # chained LN -> int8 epilogue (requires bn == N: the block
                # holds a full feature row, so the statistics are exact) —
                # emits the next op's quantized input alongside y, deleting
                # the standalone ln_quant pass's (M, N) bf16 re-read
                from tae_tpu.ops.pallas.int8_block import _ln_quant_epilogue

                _ln_quant_epilogue(y, g_ref, be_ref, nq_ref, ns_ref, ln_eps)


def int8_matmul_fused(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                      bias: jnp.ndarray | None = None,
                      block_m: int = 256, block_n: int = 512,
                      block_k: int = 512, out_dtype=None,
                      prequantize: bool = True,
                      x_scale: jnp.ndarray | None = None,
                      residual: jnp.ndarray | None = None,
                      q8_out: bool = False,
                      interpret: bool = False,
                      ln_out=None):
    """x (M, K) float, w_q (K, N) int8, w_scale (N,) -> (M, N).

    ``prequantize=True`` (default) quantizes x to int8 once with a cheap XLA
    pass before the kernel — in-kernel quantization reruns per n-block
    (N/block_n redundant VPU passes) and halves the read-traffic win.
    ``x_scale`` lets callers pass already-int8 x with its (M, 1) per-row
    scales (e.g. from :func:`tae_tpu.ops.pallas.int8_block.ln_quant`) so no
    quantize pass runs at all. ``residual`` (M, N) is added in the epilogue
    (fused residual-connection add).
    Shapes must tile evenly into the (possibly clamped) blocks; callers pad
    (tae_tpu.ops.int8 handles arbitrary leading dims and padding).
    """
    m, k = x.shape
    _, n = w_q.shape
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    if m % block_m or n % block_n or k % block_k:
        raise ValueError(f"shape ({m},{k})x({k},{n}) not divisible by blocks "
                         f"({block_m},{block_n},{block_k})")
    n_k = k // block_k

    if x_scale is not None:
        assert x.dtype == jnp.int8, "x_scale requires already-quantized x"
        out_dtype = out_dtype or jnp.bfloat16
        sx = x_scale
    else:
        out_dtype = out_dtype or x.dtype
        # per-row symmetric scales: reduce |x| in the INPUT dtype (abs/max is
        # exact in bf16, so sx is bit-identical to the f32-converted form) and
        # convert inside the quantize expression — a shared pre-converted x32
        # made XLA materialize the full f32 activation as a separate pass
        # (profiled 1.7 ms/layer at p16, ~5% of int8 encode); inline, the
        # convert fuses into the round/clip/s8 loop and x is read as bf16
        sx = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        if prequantize:
            # the barrier keeps this convert from CSE-merging with the amax
            # reduce's internal convert — merged, XLA materializes the full
            # f32 activation as a fusion output (an extra (M, K) f32 HBM
            # round-trip); distinct, it fuses into the round/clip/s8 loop
            xb = jax.lax.optimization_barrier(x)
            x = jnp.clip(jnp.round(xb.astype(jnp.float32) / sx),
                         -127.0, 127.0).astype(jnp.int8)

    has_bias = bias is not None
    b_arg = bias.reshape(1, n) if has_bias else jnp.zeros((1, n), jnp.float32)
    has_residual = residual is not None
    res_arg = residual if has_residual else jnp.zeros((1, n), jnp.float32)
    res_bm = block_m if has_residual else 1
    res_map = (lambda i, j, kk: (i, j)) if has_residual \
        else (lambda i, j, kk: (0, j))

    if ln_out is not None and (q8_out or block_n != n):
        raise ValueError("ln_out requires a full-row n block and not q8_out")

    qik = x_scale is None and not prequantize
    if ln_out is not None:
        gamma, beta, eps = ln_out
        body = lambda xr, wr, sxr, swr, br, rr, gr, ber, or_, nqr, nsr, accr: \
            _kernel(  # noqa: E731
                xr, wr, sxr, swr, br, rr, or_, accr, n_k=n_k,
                has_bias=has_bias, has_residual=has_residual,
                quantize_in_kernel=qik, ln_eps=float(eps), g_ref=gr,
                be_ref=ber, nq_ref=nqr, ns_ref=nsr)
        out_specs = [
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((m, n), out_dtype or jnp.bfloat16),
                     jax.ShapeDtypeStruct((m, n), jnp.int8),
                     jax.ShapeDtypeStruct((m, 1), jnp.float32)]
        res = pl.pallas_call(
            body,
            grid=(m // block_m, n // block_n, n_k),
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((res_bm, block_n), res_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=_vmem_limit()),
            interpret=interpret,
        )(x, w_q, sx, w_scale.reshape(1, n).astype(jnp.float32),
          b_arg.astype(jnp.float32), res_arg,
          gamma.reshape(1, n), beta.reshape(1, n))
        return res

    if q8_out:
        body = lambda xr, wr, sxr, swr, br, rr, or_, sor, accr: _kernel(  # noqa: E731
            xr, wr, sxr, swr, br, rr, or_, accr, n_k=n_k, has_bias=has_bias,
            has_residual=has_residual, quantize_in_kernel=qik,
            q8_out=True, so_ref=sor)
        out_specs = [
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            # per-(row, n-block) scales: n-block index rides the LEADING
            # output dim (a (bm, 1) lane block is legal; (bm,) per j isn't)
            pl.BlockSpec((1, block_m, 1), lambda i, j, kk: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((m, n), jnp.int8),
                     jax.ShapeDtypeStruct((n // block_n, m, 1), jnp.float32)]
    else:
        body = functools.partial(_kernel, n_k=n_k, has_bias=has_bias,
                                 has_residual=has_residual,
                                 quantize_in_kernel=qik)
        out_specs = pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
    return pl.pallas_call(
        body,
        grid=(m // block_m, n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((res_bm, block_n), res_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(x, w_q, sx, w_scale.reshape(1, n).astype(jnp.float32),
      b_arg.astype(jnp.float32), res_arg)
