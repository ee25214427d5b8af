"""Fused int8 transformer-block kernels (Pallas TPU, serving path).

Round-1 measurement (CLAUDE.md): the standalone fused int8 matmul beats XLA
bf16 (258 vs 190 T/s on v5e) but END-TO-END int8 encode was flat — XLA loses
its elementwise fusions around ``pallas_call`` boundaries and the activation
quantize passes (one full read+write of every activation) eat the MXU win.
These kernels close that gap by moving every elementwise pass into the
kernels that already touch the data:

  * :func:`ln_quant` — LayerNorm (fp32 statistics, torch-autocast semantics,
    reference tae.py:122/159) fused with symmetric per-row int8 activation
    quantization: one HBM read of the bf16 activations, one int8 write
    (half the bytes) plus a (M, 1) scale vector. Replaces LN-write +
    quantize-read+write (3 full passes) with 1.5.
  * :func:`int8_mlp` — the whole ViT MLP (reference tae.py:100-105:
    fc1 -> GELU -> fc2) plus the residual add in ONE kernel: int8 x int8
    matmuls on the MXU, GELU (tanh form — see tae_tpu/nn/vit.py GELU note)
    and re-quantization of the hidden activations in VMEM, fp32 accumulation
    over hidden blocks, residual-add epilogue. The (M, 4d) hidden activation
    never exists in HBM in any precision.

Hidden-activation quantization is per-row *per hidden block* (block_h
columns share one scale per row), which is strictly finer-grained — and
therefore more accurate — than one per-row scale over the full hidden dim;
it also makes fp32 (not int32) block accumulation exact per block.

Serving-only (no VJPs): int8 is an opt-in inference path
(``Tokenizer.from_checkpoint(..., quantization="int8")``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tae_tpu.ops.int8 import _block as _lane_block


# ---------------------------------------------------------------------------
# fused LayerNorm -> int8 quantize
# ---------------------------------------------------------------------------

def _ln_quant_kernel(x_ref, w_ref, b_ref, xq_ref, sx_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                     # (bm, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32) \
        + b_ref[:].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq_ref[:] = jnp.clip(jnp.round(y * pl.reciprocal(s, approx=False)),
                         -127.0, 127.0).astype(jnp.int8)
    sx_ref[:] = s


def ln_quant(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
             eps: float = 1e-6, block_m: int = 256,
             interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x (M, D) float -> (int8 LayerNormed x, (M, 1) fp32 per-row scales)."""
    m, d = x.shape
    bm = min(block_m, -(-m // 32) * 32)  # int8 sublane tile is 32
    pad = (-m) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    mp = x.shape[0]
    xq, sx = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((mp, d), jnp.int8),
                   jax.ShapeDtypeStruct((mp, 1), jnp.float32)],
        interpret=interpret,
    )(x, weight.reshape(1, d), bias.reshape(1, d))
    if pad:
        xq, sx = xq[:m], sx[:m]
    return xq, sx


# ---------------------------------------------------------------------------
# fused int8 MLP (fc1 -> GELU -> requantize -> fc2) + residual
# ---------------------------------------------------------------------------

def _ln_quant_epilogue(y, g_ref, be_ref, xq_ref, s_ref, eps: float):
    """Shared LN->int8 epilogue body: y (bm, D) f32 is a FULL feature row,
    so LayerNorm statistics are exact in the epilogue. Writes the quantized
    next-op input + per-row scales (the chained layout ln_quant produces)."""
    mean = jnp.mean(y, axis=-1, keepdims=True)
    yc = y - mean
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    z = yc * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32) \
        + be_ref[:].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(z), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq_ref[:] = jnp.clip(jnp.round(z * pl.reciprocal(s, approx=False)),
                         -127.0, 127.0).astype(jnp.int8)
    s_ref[:] = s


def _mlp_kernel(xq_ref, sx_ref, w1_ref, sw1_ref, b1_ref, w2_ref,
                sw2_ref, b2_ref, res_ref, *refs, n_h: int,
                ln_eps: float | None = None):
    if ln_eps is not None:
        g_ref, be_ref, o_ref, nq_ref, ns_ref, acc_ref = refs
    else:
        o_ref, acc_ref = refs
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fc1 over the full model dim: (bm, D) int8 x (D, bh) int8 -> int32
    ig = jax.lax.dot_general(xq_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    h = ig.astype(jnp.float32) * sx_ref[:] * sw1_ref[:] \
        + b1_ref[:].astype(jnp.float32)
    # tanh-form GELU (max error below bf16 rounding; see nn/vit.py)
    h = jax.nn.gelu(h, approximate=True)
    # per-row re-quantization, scoped to this hidden block
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0, 1e-12)
    hq = jnp.clip(jnp.round(h * pl.reciprocal(sh, approx=False)),
                  -127.0, 127.0).astype(jnp.int8)
    # fc2 partial: (bm, bh) int8 x (bh, D) int8, fp32-accumulated with the
    # per-(row, block) hidden scale folded in
    ig2 = jax.lax.dot_general(hq, w2_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc_ref[:] += ig2.astype(jnp.float32) * sh

    @pl.when(hb == n_h - 1)
    def _():
        y = acc_ref[:] * sw2_ref[:] + b2_ref[:].astype(jnp.float32) \
            + res_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)
        if ln_eps is not None:
            # chain: the NEXT layer's pre-LN quantized input leaves this
            # kernel too — the standalone ln_quant's full re-read of the
            # residual stream (one (M, D) bf16 pass per layer half) vanishes
            _ln_quant_epilogue(y, g_ref, be_ref, nq_ref, ns_ref, ln_eps)


def _ln_chain_bm(m: int, d: int, hdim: int, block_m: int,
                 bh: int) -> int | None:
    """Pick the m-block for a chained LN+quantize MLP epilogue, or None.

    The chained epilogue adds an s8 (bm, d) + (bm, 1) output pair plus LN
    temporaries. Never accept estimates right AT the scoped limit: the
    boundary is graph-dependent — at the historical 16M limit the p16
    bm-512 chained estimate landed on exactly 16.00M and compiled in the
    bench/encode graphs, yet Mosaic allocated 17.43M for the same kernel
    spec inside a batch-64 serving graph with a float pred head (caught by
    a real-TPU drive; the Mosaic footprint varies ~4% with surrounding
    layout constraints). So: accept only under a margined budget
    (TAE_TPU_INT8_MLP_LN_BUDGET overrides), and when the default bm busts
    it try other m-blocks — but only those whose chained weight traffic
    (fc1+fc2 restream once per m-block) still beats the unchained kernel
    plus the standalone ln_quant pass it replaces (read (M, D) bf16 +
    write s8 + scales ~ 3 bytes/elem); None = caller runs ln_quant.
    TAE_TPU_INT8_MLP_LN_FORCE bypasses both bounds (tuning knob).
    """
    from tae_tpu.ops.int8 import vmem_limit

    budget = int(os.environ.get("TAE_TPU_INT8_MLP_LN_BUDGET",
                                vmem_limit() * 7 // 8))
    m_pad0 = -(-m // 32) * 32
    w_bytes = 2 * d * hdim  # fc1 + fc2, int8
    alt = (-(-m_pad0 // min(block_m, m_pad0)) * w_bytes
           + 3 * m_pad0 * d)
    force = bool(os.environ.get("TAE_TPU_INT8_MLP_LN_FORCE"))
    cands = [min(c, m_pad0) for c in (block_m, 448, 384, 320, 256)]
    # pad-free candidates first (a non-dividing bm materializes a full
    # (M, D) pad + slice pair around the kernel; see _ln_chain_plan).
    # NB the reorder breaks the descending-bm order, so a candidate
    # failing the traffic bound must not end the scan — a larger bm
    # later in the list can still pass (e.g. m_pad0=2816: pad-free 256
    # restreams 11x and loses, but 512 restreams 6x and wins).
    for bm_c in ([c for c in cands if m_pad0 % c == 0]
                 + [c for c in cands if m_pad0 % c != 0]):
        if not force and -(-m_pad0 // bm_c) * w_bytes > alt:
            continue  # this bm restreams more than unchained + ln_quant
        est = (14 * bm_c * d + 4 * d * bh + 1024 * bm_c
               + 128 * (bh + d) + 8 * bm_c * d + 2 * 128 * d)
        if force or est <= budget:
            return bm_c
    return None


def int8_mlp(xq: jnp.ndarray, sx: jnp.ndarray,
             w1_q: jnp.ndarray, w1_scale: jnp.ndarray, b1: jnp.ndarray,
             w2_q: jnp.ndarray, w2_scale: jnp.ndarray, b2: jnp.ndarray,
             residual: jnp.ndarray, block_m: int | None = None,
             block_h: int | None = None,
             out_dtype=jnp.bfloat16, interpret: bool = False,
             ln_next=None):
    """residual + fc2(gelu(fc1(dequant(xq)))) with int8 weights, one kernel.

    xq (M, D) int8 with per-row scales sx (M, 1) — the output of
    :func:`ln_quant`. w1_q (D, H) / w2_q (H, D) int8 with per-output-channel
    scales (tae_tpu.ops.int8.quantize_weight layout). residual (M, D) float.

    Weight blocks are re-streamed once per M block, so larger ``block_m``
    cuts HBM weight traffic linearly until VMEM runs out; defaults are
    env-overridable (TAE_TPU_INT8_MLP_BM / _BH) for on-chip tuning.

    ``ln_next = (gamma, beta, eps)`` chains the NEXT pre-LN + quantize into
    the epilogue (the output block is already a full feature row, so LN
    statistics are exact): returns ``(y, xq_next, sx_next)`` instead of
    ``y``, and the per-layer standalone ln_quant read of the residual
    stream disappears. Falls back to ``(y, None, None)`` when the extra
    VMEM doesn't fit — callers must handle the standalone path then.
    """
    from tae_tpu.ops.int8 import vmem_limit

    m, d = xq.shape
    hdim = w1_q.shape[1]
    # measured on v5e (batch-128 encode): bm 256 > 128 (+4% p64) since weight
    # blocks re-stream once per M block; bigger bh halves accumulator-update
    # passes. The kernel's VMEM footprint must stay under the Mosaic scoped
    # limit — historically 16M (with a graph-dependent ±4% boundary that
    # produced scoped-OOMs on borderline estimates), now raised to
    # vmem_limit() (32M default; the v5e physically has the room — see that
    # docstring). At the old 16M: d=2560 ran bh 512 (within 0.6% of 1024),
    # small-d fit bm 512 / bh 1024. With 32M the auto-pick reaches bh 2048
    # at d<=1024 (standalone -7%) and bh 1024+chain at d=2560.
    if block_m is None:
        block_m = int(os.environ.get("TAE_TPU_INT8_MLP_BM",
                                     "512" if d <= 1024 else "256"))
    env_bh = os.environ.get("TAE_TPU_INT8_MLP_BH")
    if block_h is None and env_bh:
        block_h = int(env_bh)
    elif block_h is None:
        block_h = 2048
        bm_est = min(block_m, m)
        vmem = lambda bh: (14 * bm_est * d + 4 * d * bh  # noqa: E731
                           + 1024 * bm_est + 128 * (bh + d))
        # proportional margin: the analytic model ran ~2-4% under Mosaic's
        # real allocation in observed graphs
        while block_h > 128 and vmem(block_h) > vmem_limit() * 7 // 8:
            block_h //= 2
        # Small-M regime: few m-blocks -> few grid programs, and a big bh
        # starves the pipeline's DMA/compute overlap (measured, d=2560:
        # p128 m=1024 runs 14.3k img/s at bh 512 / 80 programs vs 11.6k at
        # bh 1024 / 40; serve-b8 m=128 runs 2901 at bh 1024 / 10 programs
        # vs 2742 at bh 2048 / 5 — while p64 m=2048 prefers bh 1024 at 80
        # programs, +3.8%). Halve bh (floor 512) until the grid reaches 64
        # programs; the VMEM-budget loop above already bounded it.
        mb = -(-m // min(block_m, -(-m // 32) * 32))
        while block_h > 512 and mb * hdim // block_h < 64:
            block_h //= 2
    bh = _lane_block(hdim, block_h)
    want_ln = ln_next is not None
    if ln_next is not None:
        chosen = _ln_chain_bm(m, d, hdim, block_m, bh)
        if chosen is None:
            ln_next = None
        else:
            block_m = chosen
    bm = min(block_m, -(-m // 32) * 32)  # int8 sublane tile is 32
    pad = (-m) % bm
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)), constant_values=1.0)
        residual = jnp.pad(residual, ((0, pad), (0, 0)))
    mp = xq.shape[0]
    n_h = hdim // bh

    in_specs = [
        pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bh, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xq, sx, w1_q, w1_scale.reshape(1, hdim).astype(jnp.float32),
                b1.reshape(1, hdim).astype(jnp.float32), w2_q,
                w2_scale.reshape(1, d).astype(jnp.float32),
                b2.reshape(1, d).astype(jnp.float32), residual]
    out_specs = [pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((mp, d), out_dtype)]
    if ln_next is not None:
        gamma, beta, eps = ln_next
        in_specs += [pl.BlockSpec((1, d), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [gamma.reshape(1, d), beta.reshape(1, d)]
        out_specs += [
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [jax.ShapeDtypeStruct((mp, d), jnp.int8),
                      jax.ShapeDtypeStruct((mp, 1), jnp.float32)]
        body = functools.partial(_mlp_kernel, n_h=n_h, ln_eps=float(eps))
    else:
        body = functools.partial(_mlp_kernel, n_h=n_h)

    res = pl.pallas_call(
        body,
        grid=(mp // bm, n_h),
        in_specs=in_specs,
        out_specs=out_specs if ln_next is not None else out_specs[0],
        out_shape=out_shape if ln_next is not None else out_shape[0],
        scratch_shapes=[pltpu.VMEM((bm, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit()),
        interpret=interpret,
    )(*operands)
    if ln_next is not None:
        out, nq, ns = res
        if pad:
            out, nq, ns = out[:m], nq[:m], ns[:m]
        return out, nq, ns
    out = res
    if pad:
        out = out[:m]
    return (out, None, None) if want_ln else out
