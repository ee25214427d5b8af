"""Fused w4a8 MLP kernel (Pallas TPU) — int4 counterpart of int8_mlp.

Same single-kernel structure as :func:`tae_tpu.ops.pallas.int8_block.int8_mlp`
(fc1 -> tanh-GELU -> per-(row, hidden-block) requantize -> fc2 -> +residual,
no HBM hidden activation), with the weights in the packed nibble-plane int4
layout of :mod:`tae_tpu.ops.int4`.

The grid walks **plane pairs** of hidden blocks: step ``pb`` computes hidden
blocks ``pb`` (rows in the LOW nibble plane of the packed fc2 weight) and
``pb + n_h/2`` (the HIGH plane rows of the *same* byte rows) together, so

  * each fc2 byte block is DMA'd exactly **once** — an earlier revision
    indexed fc2 bytes with ``hb % (n_h/2)`` and fetched every block twice,
    which made fc2 (a third of the block weight bytes) stream the same
    bytes as int8 and erased its DMA savings;
  * both nibbles of every fetched byte feed an MXU dot in the same step,
    so the decode (2 VPU ops per nibble in the offset-8 layout, see
    tae_tpu/ops/int4.py) is shared across the pair.

fc1 (D, H): the two hidden-column blocks of the pair arrive as two refs on
the same underlying array (two index maps); the kernel walks plane-aligned
scale groups with static slices, one int8 MXU dot per (group, plane),
accumulating ``Σ_g ig_g · s1_g`` in fp32. Unpacking happens per group slice
so the int32 decode temporaries stay (G, bh)-sized.

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


def _nib_lo(b32):
    # offset-8 layout: byte = 16·hi + (lo + 8), sign-extended input
    return ((b32 & 15) - 8).astype(jnp.int8)


def _nib_hi(b32):
    # exact floor division: the low-nibble remainder is in [1, 15]
    return (b32 >> 4).astype(jnp.int8)


def _mlp4_kernel(xq_ref, sx_ref, w1a_ref, w1b_ref, s1a_ref, s1b_ref,
                 b1a_ref, b1b_ref, w2_ref, s2a_ref, s2b_ref,
                 b2_ref, res_ref, o_ref, acc_ref, *, n_p: int, g1: int,
                 n_g1: int, g2: int, n_g2: int, half_d: int):
    pb = pl.program_id(1)

    @pl.when(pb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bm = xq_ref.shape[0]
    bh = w1a_ref.shape[1]

    # ---- fc1 for both pair members: h = (Σ_g ig_g · s1_g) · sx + b1 ----
    def fc1_h(w1_ref, s1_ref, b1_ref):
        h = jnp.zeros((bm, bh), jnp.float32)
        for gi in range(n_g1):
            rows = slice(gi * g1, (gi + 1) * g1)
            b32 = w1_ref[rows, :].astype(jnp.int32)
            ig = jax.lax.dot_general(xq_ref[:, rows], _nib_lo(b32),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            h += ig.astype(jnp.float32) * s1_ref[gi]
            cols = slice(half_d + gi * g1, half_d + (gi + 1) * g1)
            ig = jax.lax.dot_general(xq_ref[:, cols], _nib_hi(b32),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            h += ig.astype(jnp.float32) * s1_ref[n_g1 + gi]
        h = h * sx_ref[:] + b1_ref[:].astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=True)
        # per-(row, hidden-block) requantize (same as int8_mlp)
        sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0,
                         1e-12)
        hq = jnp.clip(jnp.round(h * pl.reciprocal(sh, approx=False)),
                      -127.0, 127.0).astype(jnp.int8)
        return hq, sh

    hqa, sha = fc1_h(w1a_ref, s1a_ref, b1a_ref)
    hqb, shb = fc1_h(w1b_ref, s1b_ref, b1b_ref)

    # ---- fc2: ONE byte block feeds both planes' dots ----
    part_a = jnp.zeros_like(acc_ref)
    part_b = jnp.zeros_like(acc_ref)
    for gi in range(n_g2):
        rows = slice(gi * g2, (gi + 1) * g2)
        b32 = w2_ref[rows, :].astype(jnp.int32)
        ig = jax.lax.dot_general(hqa[:, rows], _nib_lo(b32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        part_a += ig.astype(jnp.float32) * s2a_ref[0, gi]
        ig = jax.lax.dot_general(hqb[:, rows], _nib_hi(b32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        part_b += ig.astype(jnp.float32) * s2b_ref[0, gi]
    acc_ref[:] += part_a * sha + part_b * shb

    @pl.when(pb == n_p - 1)
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
    n_p = n_h // 2               # plane pairs (n_h is even: bh | H/2)
    n_g1 = n_groups1 // 2
    if half_d % n_g1:
        raise ValueError(f"fc1 groups {n_groups1} not plane-aligned for D={d}")

    out = pl.pallas_call(
        functools.partial(_mlp4_kernel, n_p=n_p, g1=g1, n_g1=n_g1,
                          g2=g2, n_g2=bh // g2, half_d=half_d),
        grid=(mp // bm, n_p),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, pb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, pb: (i, 0),
                         memory_space=pltpu.VMEM),
            # fc1 column blocks of the pair: hidden blocks pb and pb + n_p
            pl.BlockSpec((half_d, bh), lambda i, pb: (0, pb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half_d, bh), lambda i, pb, _p=n_p: (0, pb + _p),
                         memory_space=pltpu.VMEM),
            # scales ride (.., 1, cols) blocks: group indices live in
            # leading block dims (Mosaic forbids size-1 sublane blocks)
            pl.BlockSpec((n_groups1, 1, bh), lambda i, pb: (0, 0, pb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups1, 1, bh), lambda i, pb, _p=n_p: (0, 0, pb + _p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh), lambda i, pb: (0, pb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh), lambda i, pb, _p=n_p: (0, pb + _p),
                         memory_space=pltpu.VMEM),
            # fc2 byte rows [pb·bh, (pb+1)·bh): lo plane = hidden block pb,
            # hi plane = hidden block pb + n_p — fetched once per pair
            pl.BlockSpec((bh, d), lambda i, pb: (pb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh // g2, 1, d), lambda i, pb: (pb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh // g2, 1, d), lambda i, pb, _p=n_p: (pb + _p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, pb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i, pb: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, pb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, d), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(xq, sx, w1_4, w1_4,
      w1_scale.reshape(n_groups1, 1, hdim), w1_scale.reshape(n_groups1, 1, hdim),
      b1.reshape(1, hdim), b1.reshape(1, hdim), w2_4,
      w2_scale.reshape(n_h, bh // g2, 1, d), w2_scale.reshape(n_h, bh // g2, 1, d),
      b2.reshape(1, d), residual)
    return out[:m] if pad else out
