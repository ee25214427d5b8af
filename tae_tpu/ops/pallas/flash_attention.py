"""Fused scaled-dot-product attention as a Pallas TPU kernel.

TPU replacement for the reference's flash-attention-2 SDPA call
(reference tae.py:78). The TAE shape regime is the *opposite* of the long-
sequence case flash attention was designed for: N ∈ {4, 16, 64, 256} tokens
with 16-32 heads of dim 64-80 (SURVEY.md §3.5). The entire (N, N) score
matrix fits comfortably in VMEM, so the right kernel is a single fused
pass per (batch·head): QKᵀ → softmax → ·V with no HBM round-trip for the
scores — blockwise online-softmax streaming would only add loop overhead.

Forward and backward are both single-pass kernels wired up via
``jax.custom_vjp``; the backward recomputes the score matrix from the saved
log-sum-exp (the standard flash-attention backward, degenerate single-block
case). The inference path uses a separate kernel that skips the LSE output.

Numerics match :func:`tae_tpu.ops.attention.attention_xla`: fp32 score
accumulation and softmax statistics, output cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (TPU memory spaces)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, with_lse: bool,
                lse_ref=None):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    if with_lse:
        lse_ref[0] = m + jnp.log(l)  # (N, 1)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (N, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                                       # (N, N)
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)            # (N, 1)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bh_spec(n: int, dh: int):
    return pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _lse_spec(n: int):
    # (bh, N, 1): keeping the trailing singleton keeps the block shape legal
    # under Mosaic's (÷8, ÷128)-or-full tiling rule for every N in {4..256}.
    return pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale: float, with_lse: bool, interpret: bool):
    bh, n, dh = q.shape
    out_shape = [jax.ShapeDtypeStruct((bh, n, dh), q.dtype)]
    out_specs = [_bh_spec(n, dh)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, n, 1), jnp.float32))
        out_specs.append(_lse_spec(n))
    kernel = functools.partial(_fwd_kernel, scale=scale, with_lse=False)
    if with_lse:
        kernel = lambda qr, kr, vr, or_, lr: _fwd_kernel(  # noqa: E731
            qr, kr, vr, or_, scale=scale, with_lse=True, lse_ref=lr)
    res = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[_bh_spec(n, dh)] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v)
    return res if with_lse else (res[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale: float, interpret: bool):
    o, _ = _fwd_call(q, k, v, scale, with_lse=False, interpret=interpret)
    return o


def _flash_fwd(q, k, v, scale: float, interpret: bool):
    o, lse = _fwd_call(q, k, v, scale, with_lse=True, interpret=interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(scale: float, interpret: bool, residuals, do):
    q, k, v, o, lse = residuals
    bh, n, dh = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[_bh_spec(n, dh)] * 4 + [_lse_spec(n)] + [_bh_spec(n, dh)],
        out_specs=[_bh_spec(n, dh)] * 3,
        out_shape=[jax.ShapeDtypeStruct((bh, n, dh), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, o, lse, do)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention. q, k, v: (B, H, N, dh) -> (B, H, N, dh)."""
    b, h, n, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    fold = lambda x: x.reshape(b * h, n, dh)  # noqa: E731
    o = _flash(fold(q), fold(k), fold(v), float(scale), interpret)
    return o.reshape(b, h, n, dh)
