"""Fused LayerNorm as a Pallas TPU kernel.

Profiling the encode path showed XLA's LayerNorm fusions
(convert_reduce_fusion) at ~6.5% of step time: the fp32-statistics pattern
costs multiple HBM passes over the activations. This kernel does one
read + one write per row block: statistics, normalization, and the affine
transform all happen in VMEM (fp32 math, bf16 I/O — same numerics contract
as :func:`tae_tpu.ops.layernorm.layer_norm`, i.e. torch autocast semantics).

Forward-only fusion with a custom VJP: the backward uses the saved
(mean, rstd) and runs the standard LN backward, also as one fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, mean_ref, rstd_ref, *,
                eps: float, save_stats: bool):
    x = x_ref[:].astype(jnp.float32)               # (bm, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)
    if save_stats:
        mean_ref[:] = mean
        rstd_ref[:] = rstd


def _bwd_kernel(x_ref, w_ref, mean_ref, rstd_ref, do_ref,
                dx_ref, dw_ref, db_ref):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    xhat = (x - mean) * rstd
    # standard LN backward
    dy = do * w
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    dx = (dy - m1 - xhat * m2) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # dw/db accumulate across the (sequential) grid into one (8, D) block —
    # per-block (1, D) outputs would violate Mosaic's sublane tiling

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[0:1, :] += jnp.sum(do * xhat, axis=0, keepdims=True)
    db_ref[0:1, :] += jnp.sum(do, axis=0, keepdims=True)


def _pick_block(m: int, d: int, budget_bytes: int = 6 * 1024 * 1024) -> int:
    rows = max(budget_bytes // max(d * 4 * 3, 1), 8)
    bm = 8
    while bm * 2 <= min(rows, m):
        bm *= 2
    return bm


def _fwd_call(x2, w, b, eps: float, save_stats: bool, interpret: bool):
    m, d = x2.shape
    bm = _pick_block(m, d)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    mp = x2.shape[0]
    grid = (mp // bm,)
    row_spec = pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((mp, d), x2.dtype),
                 jax.ShapeDtypeStruct((mp, 1), jnp.float32),
                 jax.ShapeDtypeStruct((mp, 1), jnp.float32)]
    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, save_stats=True),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=[row_spec, stat_spec, stat_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(x2, w.reshape(1, d), b.reshape(1, d))
    if pad:
        y, mean, rstd = y[:m], mean[:m], rstd[:m]
    return y, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, weight, bias, eps: float = 1e-6,
                     interpret: bool = False):
    """LayerNorm over the last axis; x (..., D) any float dtype."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    y, _, _ = _fwd_call(x.reshape(-1, d), weight, bias, eps, False, interpret)
    return y.reshape(*lead, d)


def _fln_fwd(x, weight, bias, eps, interpret):
    lead = x.shape[:-1]
    d = x.shape[-1]
    y, mean, rstd = _fwd_call(x.reshape(-1, d), weight, bias, eps, True,
                              interpret)
    return y.reshape(*lead, d), (x, weight, mean, rstd)


def _fln_bwd(eps, interpret, res, dy):
    x, weight, mean, rstd = res
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    dy2 = dy.reshape(-1, d)
    m = x2.shape[0]
    bm = _pick_block(m, d)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, pad), (0, 0)))
        mean = jnp.pad(mean, ((0, pad), (0, 0)))
        rstd = jnp.pad(rstd, ((0, pad), (0, 0)), constant_values=1.0)
    mp = x2.shape[0]
    grid = (mp // bm,)
    row_spec = pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, dw_acc, db_acc = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[row_spec, vec_spec, stat_spec, stat_spec, row_spec],
        out_specs=[row_spec, acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((mp, d), x.dtype),
                   jax.ShapeDtypeStruct((8, d), jnp.float32),
                   jax.ShapeDtypeStruct((8, d), jnp.float32)],
        interpret=interpret,
    )(x2, weight.reshape(1, d), mean, rstd, dy2)
    if pad:
        dx = dx[:m]
    dw = dw_acc[0].astype(weight.dtype)
    db = db_acc[0].astype(weight.dtype)
    return dx.reshape(*lead, d), dw, db


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)
