"""Fused w4a8 MLP kernel (Pallas TPU) — int4 counterpart of int8_mlp.

Same single-kernel structure as :func:`tae_tpu.ops.pallas.int8_block.int8_mlp`
(fc1 -> tanh-GELU -> per-(row, hidden-block) requantize -> fc2 -> +residual,
no HBM hidden activation), with the weights in the packed nibble-plane int4
layout of :mod:`tae_tpu.ops.int4`:

  * fc1 (D, H): packed (D/2, bh) byte block per hidden block; the kernel
    walks plane-aligned scale groups with static slices, running one int8
    MXU dot per (group, plane) and accumulating ``Σ_g ig_g · s1_g`` in fp32.
    Unpacking happens per group slice so the int32 nibble-decode temporaries
    stay (G, bh)-sized instead of (D/2, bh).
  * fc2 (H, D): hidden blocks are plane-aligned (bh divides H/2), so block
    ``hb`` lives entirely in one nibble plane of the packed (H/2, D) array —
    the kernel selects lo/hi by comparing ``hb`` against ``n_h/2`` and never
    interleaves rows. Group scaling again via static slices.

Constraints (checked by the wrapper, falling back to int8 otherwise):
D/2 and H/2 must admit lane-valid plane-aligned groups, and bh must divide
H/2. All 12 TAE configs conform.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tae_tpu.ops.int8 import vmem_limit as _vmem_limit

from tae_tpu.ops.int8 import _block as _lane_block


def _nib_lo(u32):
    return (((u32 & 0xF) ^ 8) - 8).astype(jnp.int8)


def _nib_hi(u32):
    return ((((u32 >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)


def _mlp4_kernel(xq_ref, sx_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                 b2_ref, res_ref, o_ref, acc_ref, *, n_h: int, g1: int,
                 n_g1: int, g2: int, n_g2: int, half_d: int):
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # ---- fc1: h = (Σ_g ig_g · s1_g) · sx + b1, per-group int8 dots ----
    bm = xq_ref.shape[0]
    bh = w1_ref.shape[1]
    h = jnp.zeros((bm, bh), jnp.float32)
    for gi in range(n_g1):
        rows = slice(gi * g1, (gi + 1) * g1)
        u = w1_ref[rows, :].astype(jnp.int32) & 0xFF
        ig = jax.lax.dot_general(xq_ref[:, rows], _nib_lo(u),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        h += ig.astype(jnp.float32) * s1_ref[gi]
        cols = slice(half_d + gi * g1, half_d + (gi + 1) * g1)
        ig = jax.lax.dot_general(xq_ref[:, cols], _nib_hi(u),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        h += ig.astype(jnp.float32) * s1_ref[n_g1 + gi]
    h = h * sx_ref[:] + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)

    # ---- per-(row, hidden-block) requantize (same as int8_mlp) ----
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0,
                     1e-12)
    hq = jnp.clip(jnp.round(h * pl.reciprocal(sh, approx=False)),
                  -127.0, 127.0).astype(jnp.int8)

    # ---- fc2 partial: plane-selected nibbles, per-group fp32 scaling ----
    # select the plane by shifting with a scalar (0 for lo, 4 for hi):
    # decoding one nibble instead of unpack-both-then-select halves the
    # dominant VPU decode cost of the kernel
    shift = jnp.where(hb < n_h // 2, 0, 4)
    part = jnp.zeros_like(acc_ref)
    for gi in range(n_g2):
        rows = slice(gi * g2, (gi + 1) * g2)
        u = w2_ref[rows, :].astype(jnp.int32) & 0xFF
        w2g = (((((u >> shift) & 0xF) ^ 8) - 8)).astype(jnp.int8)
        ig = jax.lax.dot_general(hq[:, rows], w2g, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        part += ig.astype(jnp.float32) * s2_ref[0, gi]
    acc_ref[:] += part * sh

    @pl.when(hb == n_h - 1)
    def _():
        y = acc_ref[:] + b2_ref[:].astype(jnp.float32) \
            + res_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


def int4_mlp(xq: jnp.ndarray, sx: jnp.ndarray,
             w1_4: jnp.ndarray, w1_scale: jnp.ndarray, b1: jnp.ndarray,
             w2_4: jnp.ndarray, w2_scale: jnp.ndarray, b2: jnp.ndarray,
             residual: jnp.ndarray, block_m: int | None = None,
             block_h: int | None = None,
             out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """residual + fc2(gelu(fc1(dequant(xq)))) with packed int4 weights.

    xq (M, D) int8 + per-row scales sx (M, 1) (ln_quant output). w1_4
    (D/2, H) / w2_4 (H/2, D) packed nibble planes with (D/G1, H) / (H/G2, D)
    fp32 group scales (tae_tpu.ops.int4.quantize_weight_int4 layout).
    """
    m, d = xq.shape
    half_d, hdim = w1_4.shape
    assert half_d * 2 == d
    n_groups1 = w1_scale.shape[0]
    n_groups2 = w2_scale.shape[0]
    g1 = d // n_groups1
    g2 = hdim // n_groups2

    if block_m is None:
        block_m = int(os.environ.get("TAE_TPU_INT4_MLP_BM",
                                     "512" if d <= 1024 else "256"))
    if block_h is None:
        block_h = int(os.environ.get("TAE_TPU_INT4_MLP_BH", "512"))
    bm = min(block_m, -(-m // 32) * 32)
    # hidden blocks must be plane-aligned (bh | H/2) and group-aligned
    bh = _lane_block(hdim // 2, block_h)
    if bh % g2:
        raise ValueError(f"fc2 group {g2} must divide the hidden block {bh}")
    pad = (-m) % bm
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)), constant_values=1.0)
        residual = jnp.pad(residual, ((0, pad), (0, 0)))
    mp = xq.shape[0]
    n_h = hdim // bh
    n_g1 = n_groups1 // 2
    if half_d % n_g1:
        raise ValueError(f"fc1 groups {n_groups1} not plane-aligned for D={d}")

    out = pl.pallas_call(
        functools.partial(_mlp4_kernel, n_h=n_h, g1=g1, n_g1=n_g1,
                          g2=g2, n_g2=bh // g2, half_d=half_d),
        grid=(mp // bm, n_h),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, hb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, hb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half_d, bh), lambda i, hb: (0, hb),
                         memory_space=pltpu.VMEM),
            # scales ride (.., 1, cols) blocks: group indices live in
            # leading block dims (Mosaic forbids size-1 sublane blocks)
            pl.BlockSpec((n_groups1, 1, bh), lambda i, hb: (0, 0, hb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh), lambda i, hb: (0, hb),
                         memory_space=pltpu.VMEM),
            # fc2 byte rows for hidden block hb live at (hb mod n_h/2)·bh
            pl.BlockSpec((bh, d), lambda i, hb, _p=n_h // 2: (hb % _p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh // g2, 1, d),
                         lambda i, hb: (hb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, hb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i, hb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, hb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(xq, sx, w1_4, w1_scale.reshape(n_groups1, 1, hdim),
      b1.reshape(1, hdim), w2_4,
      w2_scale.reshape(n_h, bh // g2, 1, d), b2.reshape(1, d), residual)
    return out[:m] if pad else out
