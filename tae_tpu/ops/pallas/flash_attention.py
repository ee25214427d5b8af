"""Fused scaled-dot-product attention as a Pallas TPU kernel.

TPU replacement for the reference's flash-attention-2 SDPA call
(reference tae.py:78). The TAE shape regime is the *opposite* of the long-
sequence case flash attention was designed for: N ∈ {4, 16, 64, 256} tokens
with 16-32 heads of dim 64-80 (SURVEY.md §3.5). The whole per-image
attention problem — every head — fits in VMEM, so the kernel processes one
batch element per grid step with all heads as a batched in-kernel
``dot_general`` (a per-(batch·head) grid was measured 10-20x slower: ~20µs
of program overhead per tiny matmul pair). Scores never round-trip to HBM,
which is what makes this faster than the XLA path (whose fp32 (B,H,N,N)
logits are HBM-bound at these shapes).

Forward and backward are single-pass kernels wired up via
``jax.custom_vjp``; the backward recomputes scores from the saved
log-sum-exp (standard flash-attention backward, degenerate single-block
case). The inference path uses a separate kernel that skips the LSE output.

Numerics match :func:`tae_tpu.ops.attention.attention_xla`: fp32 score
accumulation and softmax statistics, output cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tae_tpu.ops.int8 import vmem_limit as _vmem_limit

_BATCHED = (((2,), (2,)), ((0,), (0,)))  # contract dh, batch over heads


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, with_lse: bool,
                lse_ref=None):
    q = q_ref[0]                                   # (H, N, dh)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, _BATCHED,
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)         # (H, N, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    if with_lse:
        lse_ref[0] = m + jnp.log(l)                # (H, N, 1)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                               # (H, N, 1)

    s = jax.lax.dot_general(q, k, _BATCHED,
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                           # (H, N, N)
    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _BATCHED,
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (H, N, 1)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _qkv_spec(h: int, n: int, dh: int):
    return pl.BlockSpec((1, h, n, dh), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _lse_spec(h: int, n: int):
    return pl.BlockSpec((1, h, n, 1), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale: float, with_lse: bool, interpret: bool):
    b, h, n, dh = q.shape
    out_shape = [jax.ShapeDtypeStruct((b, h, n, dh), q.dtype)]
    out_specs = [_qkv_spec(h, n, dh)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32))
        out_specs.append(_lse_spec(h, n))
    kernel = functools.partial(_fwd_kernel, scale=scale, with_lse=False)
    if with_lse:
        kernel = lambda qr, kr, vr, or_, lr: _fwd_kernel(  # noqa: E731
            qr, kr, vr, or_, scale=scale, with_lse=True, lse_ref=lr)
    res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_qkv_spec(h, n, dh)] * 3,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
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
    b, h, n, dh = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b,),
        in_specs=[_qkv_spec(h, n, dh)] * 4 + [_lse_spec(h, n)]
        + [_qkv_spec(h, n, dh)],
        out_specs=[_qkv_spec(h, n, dh)] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, h, n, dh), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(q, k, v, o, lse, do)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention. q, k, v: (B, H, N, dh) -> (B, H, N, dh)."""
    *_, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    return _flash(q, k, v, float(scale), interpret)


# ---------------------------------------------------------------------------
# Packed variant: (B, N, 3C) qkv in, (B, N, C) out.
#
# The head split/merge transposes around attention cost more HBM traffic
# than the attention math itself at TAE shapes (measured ~12ms of the p16
# encoder's 64ms batch). This variant moves them inside the kernel: the
# fused qkv projection's output feeds straight in, the output-projection
# matmul reads straight out, and all (de)interleaving happens in VMEM.
# ---------------------------------------------------------------------------


def _packed_fwd_kernel(qkv_ref, o_ref, *, h: int, scale: float,
                       with_lse: bool, lse_ref=None):
    """Per-head static loop over contiguous column slices of the packed qkv
    block — no reshapes/transposes (Mosaic rejects lane-dim splits like
    (N, C) -> (N, H, dh)). H small matmuls per program still amortize the
    program overhead that made the per-(batch·head) grid slow."""
    x = qkv_ref[0]                                  # (N, 3C)
    c = x.shape[1] // 3
    dh = c // h
    for i in range(h):
        q = x[:, i * dh:(i + 1) * dh]
        k = x[:, c + i * dh:c + (i + 1) * dh]
        v = x[:, 2 * c + i * dh:2 * c + (i + 1) * dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, i * dh:(i + 1) * dh] = (o / l).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0, i] = m + jnp.log(l)


_SOFTMAX_CLIP = (-60.0, 45.0)


def _serving_softmax(s):
    """Constant-shift softmax for the forward-only (serving) kernel bodies:
    ``softmax(s) == exp(s - K)/sum`` for ANY constant K, so the per-row max
    subtraction — a cross-lane VPU reduction measured at ~14% of the packed
    kernel's runtime at N=256 — is redundant; a fixed two-sided clamp
    replaces it for total safety. The FLOOR makes the function total: with
    exp(min s) = e^-60 > 0 the row sum can never underflow to 0, so no
    reciprocal(0)=inf and no 0·inf=NaN even when every score in a row is
    hugely negative (the all-underflow case a review caught: anti-aligned
    q/k rows at N=4 NaN'd where the max-subtracting form was exact). The
    CEILING keeps the unnormalized p@v f32 accumulation finite:
    N·e^45·|v| < f32 max for any |v| < ~3e16. Exact whenever
    max(s) ∈ [-60, 45] (trained-ViT logits are O(10)); beyond the clamps it
    degrades toward uniform over the clamped entries instead of
    overflowing. Training bodies keep the true max (the LSE residual wants
    it, and exactness must hold for arbitrary scores). Measured with the
    fused reciprocal: packed kernel 0.875 -> 0.732 ms at (128, 256, 16, 64).
    Returns (p, 1/sum(p))."""
    p = jnp.exp(jnp.clip(s, *_SOFTMAX_CLIP))
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, jax.lax.reciprocal(l)


def _block_diag_mask(n: int, pk: int):
    """(n·pk, n·pk) 0/1 f32 mask selecting within-batch score entries when
    ``pk`` batches are packed per sublane slab; None when pk == 1."""
    if pk == 1:
        return None
    nb = n * pk
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0) // n
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1) // n
    return (row == col).astype(jnp.float32)


def _masked_serving_softmax(s, mask):
    """Serving softmax over sublane-packed scores: multiplying p by the
    0/1 block-diagonal mask AFTER the clamped exp zeroes the cross-batch
    terms EXACTLY (an additive -1e9 mask would be clamped to exp(-60) ~
    9e-27 by _SOFTMAX_CLIP — numerically invisible but not bit-exact), so
    p, the row sums, and o are bit-identical to the unpacked computation."""
    if mask is None:
        return _serving_softmax(s)
    p = jnp.exp(jnp.clip(s, *_SOFTMAX_CLIP)) * mask
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, jax.lax.reciprocal(l)


def _packed_fwd_kernel_stacked(qkv_ref, o_ref, *, h: int, scale: float,
                               with_lse: bool, lse_ref=None,
                               serving: bool = True):
    """Head-stacked variant of _packed_fwd_kernel: pay the lane-misaligned
    head slices once into (h, N, dh) stacks, then run attention as TWO
    head-batched dot_generals and ONE big softmax instead of h interleaved
    matmul/softmax rounds (profiling showed the per-head loop at ~2% MXU
    while the surrounding matmuls hit 95%+). Default (measured p16 encode
    1418 -> 1462 bf16, 1856 -> 2000 int8); TAE_TPU_PACKED_ATTN=loop keeps
    the old body."""
    x = qkv_ref[0]                                  # (N, 3C)
    c = x.shape[1] // 3
    dh = c // h
    qs = jnp.stack([x[:, i * dh:(i + 1) * dh] for i in range(h)])
    ks = jnp.stack([x[:, c + i * dh:c + (i + 1) * dh] for i in range(h)])
    vs = jnp.stack([x[:, 2 * c + i * dh:2 * c + (i + 1) * dh]
                    for i in range(h)])
    s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if with_lse or not serving:
        # exact max-subtract form: required when LSE is emitted, and on the
        # differentiable non-LSE primal (serving=False) so f(x) matches the
        # primal of value_and_grad(f)(x) for ARBITRARY scores — the clamped
        # serving softmax diverges once any logit leaves its clip window
        m = jnp.max(s, axis=-1, keepdims=True)      # (h, N, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        l_inv = jax.lax.reciprocal(l)
    else:
        p, l_inv = _serving_softmax(s)
    o = jax.lax.dot_general(p.astype(vs.dtype), vs,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = o * l_inv
    for i in range(h):
        o_ref[0, :, i * dh:(i + 1) * dh] = o[i].astype(o_ref.dtype)
        if with_lse:
            lse_ref[0, i] = m[i] + jnp.log(l[i])


def _packed_wide_fwd_kernel(qkv_ref, o_ref, *, h: int, scale: float):
    """Wide variant for tiny N: a block of ``bb`` batch elements per program
    (one element per program is dispatch-overhead-bound below N~128), heads
    as a static loop, batch as an in-kernel batched ``dot_general``. Serving
    path (no LSE output; the training shapes use the per-batch kernel)."""
    x = qkv_ref[:]                                  # (bb, N, 3C)
    c = x.shape[2] // 3
    dh = c // h
    for i in range(h):
        q = x[:, :, i * dh:(i + 1) * dh]            # (bb, N, dh)
        k = x[:, :, c + i * dh:c + (i + 1) * dh]
        v = x[:, :, 2 * c + i * dh:2 * c + (i + 1) * dh]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)      # (bb, N, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, i * dh:(i + 1) * dh] = (o / l).astype(o_ref.dtype)


def _packed_wide_fwd_kernel_stacked(qkv_ref, o_ref, *, h: int, scale: float,
                                    group: int, serving: bool = True):
    """Head-stacked wide variant: slice ``group`` heads at a time into
    (group·bb, N, dh) stacks (head and batch merged — Mosaic's tpu.matmul
    supports at most ONE batch dim), then TWO batched dot_generals and ONE
    softmax per group — the _packed_fwd_kernel_stacked restructure, with
    the group size capped so the stacked temporaries fit scoped VMEM
    (the full-h stack overflowed the 16M limit at p64 shapes)."""
    x = qkv_ref[:]                                  # (bb, N, 3C)
    bb, n, c3 = x.shape
    c = c3 // 3
    dh = c // h
    # NOTE (r5): sublane packing (pk batches per 8-row slab, as in
    # _packed_wide_fwd_kernel_stacked_q8_2d) was MEASURED AND REVERTED
    # here: with a 3D VMEM block the (bb, n, ·) -> (bb/pk, n·pk, ·)
    # relayout costs more than the packed softmax saves — p128 bf16
    # encode 10653 -> 10417 img/s (-2.2%, bands disjoint). It wins only
    # in the 2D q8 kernel, where the rows already arrive flat.
    for g0 in range(0, h, group):
        heads = range(g0, min(g0 + group, h))
        qs = jnp.concatenate([x[:, :, i * dh:(i + 1) * dh] for i in heads])
        ks = jnp.concatenate([x[:, :, c + i * dh:c + (i + 1) * dh]
                              for i in heads])
        vs = jnp.concatenate([x[:, :, 2 * c + i * dh:2 * c + (i + 1) * dh]
                              for i in heads])      # (g*bb, N, dh)
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        if serving:
            p, l_inv = _serving_softmax(s)          # (g*bb, N, ·)
        else:
            # differentiable path: exact for arbitrary scores (the custom
            # VJP recomputes through the XLA reference, so the forward must
            # match it everywhere, not just inside the serving clamps)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l_inv = jax.lax.reciprocal(jnp.sum(p, axis=-1, keepdims=True))
        o = jax.lax.dot_general(p.astype(vs.dtype), vs,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * l_inv
        for j, i in enumerate(heads):
            o_ref[:, :, i * dh:(i + 1) * dh] = \
                o[j * bb:(j + 1) * bb].astype(o_ref.dtype)


def _packed_fwd_kernel_stacked_i8(qkv_ref, s_ref, o_ref, *, h: int,
                                  scale: float, bn: int):
    """Head-stacked per-batch kernel consuming int8 qkv with per-(row,
    n-block) scales (the ``q8_out`` epilogue of the qkv matmul,
    tae_tpu.ops.pallas.int8_matmul). Dequantization happens during the head
    stacking the kernel already pays for, so the bf16 qkv activation never
    exists in HBM — at p16 that round-trip (write + attention read) was
    ~38% of the int8 path's per-layer bytes. Requires dh | bn so every
    head's columns share one scale block (true for all N>=128 configs:
    dh=64)."""
    x = qkv_ref[0]                                  # (N, 3C) int8
    sc = s_ref[:]                                   # (n_nb, N, 1) f32
    c = x.shape[1] // 3
    dh = c // h

    def deq(col0):
        sl = x[:, col0:col0 + dh].astype(jnp.float32) * sc[col0 // bn]
        return sl.astype(jnp.bfloat16)

    qs = jnp.stack([deq(i * dh) for i in range(h)])
    ks = jnp.stack([deq(c + i * dh) for i in range(h)])
    vs = jnp.stack([deq(2 * c + i * dh) for i in range(h)])
    s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p, l_inv = _serving_softmax(s)
    o = jax.lax.dot_general(p.astype(vs.dtype), vs,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = o * l_inv
    for i in range(h):
        o_ref[0, :, i * dh:(i + 1) * dh] = o[i].astype(o_ref.dtype)


def fused_qkv_attention_i8(qkv_q, scales, num_heads: int,
                           scale: float | None = None,
                           interpret: bool = False):
    """(B, N, 3C) int8 qkv + (n_nb, B·N, 1) scales -> (B, N, C) bf16."""
    b, n, c3 = qkv_q.shape
    c = c3 // 3
    if scale is None:
        scale = (c // num_heads) ** -0.5
    n_nb = scales.shape[0]
    bn = c3 // n_nb
    if bn % (c // num_heads):
        raise ValueError(f"head dim {c // num_heads} must divide the scale "
                         f"block {bn}")
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel_stacked_i8, h=num_heads,
                          scale=float(scale), bn=bn),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nb, n, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv_q, scales.reshape(n_nb, b * n, 1))


def _packed_fwd_kernel_stacked_q8(qkv_ref, oq_ref, s_ref, *, h: int,
                                  scale: float):
    """Serving variant of _packed_fwd_kernel_stacked that emits int8 output
    with per-row symmetric scales — the proj matmul consumes it directly,
    removing the XLA-side convert+quantize passes between attention and
    proj (profiled ~10% of p16 int8 encode)."""
    x = qkv_ref[0]                                  # (N, 3C)
    n = x.shape[0]
    c = x.shape[1] // 3
    dh = c // h
    qs = jnp.stack([x[:, i * dh:(i + 1) * dh] for i in range(h)])
    ks = jnp.stack([x[:, c + i * dh:c + (i + 1) * dh] for i in range(h)])
    vs = jnp.stack([x[:, 2 * c + i * dh:2 * c + (i + 1) * dh]
                    for i in range(h)])
    s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p, l_inv = _serving_softmax(s)
    o = jax.lax.dot_general(p.astype(vs.dtype), vs,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = o * l_inv                                   # (h, N, dh) f32
    amax = jnp.max(jnp.abs(o), axis=(0, 2)).reshape(n, 1)
    sc = jnp.maximum(amax / 127.0, 1e-12)
    inv = pl.reciprocal(sc, approx=False)
    for i in range(h):
        oq_ref[0, :, i * dh:(i + 1) * dh] = jnp.clip(
            jnp.round(o[i] * inv), -127.0, 127.0).astype(jnp.int8)
    s_ref[0] = sc


def fused_qkv_attention_q8(qkv, num_heads: int, scale: float | None = None,
                           interpret: bool = False):
    """(B, N, 3C) packed qkv -> (int8 (B, N, C) attention output, (B, N, 1)
    f32 per-row scales) for the int8 serving path (per-batch grid, N>=128
    regime)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    if scale is None:
        scale = (c // num_heads) ** -0.5
    return pl.pallas_call(
        functools.partial(_packed_fwd_kernel_stacked_q8, h=num_heads,
                          scale=float(scale)),
        grid=(b,),
        in_specs=[_packed_spec(n, c3)],
        out_specs=[_packed_spec(n, c),
                   pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), jnp.int8),
                   jax.ShapeDtypeStruct((b, n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv)


def _packed_wide_fwd_kernel_stacked_q8(qkv_ref, oq_ref, s_ref, acc_ref, *,
                                       h: int, scale: float, group: int):
    """Wide (tiny-N) serving variant with int8 output: head groups
    accumulate into an f32 VMEM scratch so the per-row scale can span ALL
    heads before quantizing."""
    x = qkv_ref[:]                                  # (bb, N, 3C)
    bb, n, c3 = x.shape
    c = c3 // 3
    dh = c // h
    for g0 in range(0, h, group):
        heads = range(g0, min(g0 + group, h))
        qs = jnp.concatenate([x[:, :, i * dh:(i + 1) * dh] for i in heads])
        ks = jnp.concatenate([x[:, :, c + i * dh:c + (i + 1) * dh]
                              for i in heads])
        vs = jnp.concatenate([x[:, :, 2 * c + i * dh:2 * c + (i + 1) * dh]
                              for i in heads])
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p, l_inv = _serving_softmax(s)
        o = jax.lax.dot_general(p.astype(vs.dtype), vs,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * l_inv
        for j, i in enumerate(heads):
            acc_ref[:, :, i * dh:(i + 1) * dh] = o[j * bb:(j + 1) * bb]
    o_all = acc_ref[:]                              # (bb, N, C) f32
    sc = jnp.maximum(jnp.max(jnp.abs(o_all), axis=2, keepdims=True) / 127.0,
                     1e-12)
    oq_ref[:] = jnp.clip(jnp.round(o_all * pl.reciprocal(sc, approx=False)),
                         -127.0, 127.0).astype(jnp.int8)
    s_ref[:] = sc


def fused_qkv_attention_wide_q8(qkv, num_heads: int,
                                scale: float | None = None,
                                block_b: int | None = None,
                                interpret: bool = False):
    """Wide (tiny-N) counterpart of :func:`fused_qkv_attention_q8`."""
    import os

    b, n, c3 = qkv.shape
    c = c3 // 3
    if scale is None:
        scale = (c // num_heads) ** -0.5
    block_b = _wide_block_b(b, n, block_b)
    # tighter head-group budget than the plain wide kernel: this variant
    # adds a (block_b, n, c) f32 accumulator scratch for the cross-group
    # amax, which counts against the same scoped-VMEM pool
    group = _wide_stack_group(num_heads, block_b, n, c // num_heads,
                              budget=2 << 20)
    spec3 = pl.BlockSpec((block_b, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    speco = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    specs = pl.BlockSpec((block_b, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_wide_fwd_kernel_stacked_q8, h=num_heads,
                          scale=float(scale), group=group),
        grid=(b // block_b,),
        in_specs=[spec3],
        out_specs=[speco, specs],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), jnp.int8),
                   jax.ShapeDtypeStruct((b, n, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_b, n, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv)


def _packed_wide_fwd_kernel_stacked_q8_2d(qkv_ref, oq_ref, s_ref, acc_ref, *,
                                          h: int, n: int, scale: float,
                                          group: int):
    """2D-layout variant of :func:`_packed_wide_fwd_kernel_stacked_q8`:
    reads (bb*n, 3C) rows and writes (bb*n, C) int8 + (bb*n, 1) scales.
    The (bb, n, ...) view needed for the batched attention matmuls is
    materialized by an in-VMEM reshape, which is orders of magnitude
    cheaper than the HBM retile the 3D entry forces on the caller when n
    is below the 8-row sublane tile (n=4 pads to 8: the r5 profile showed
    the [1024,7680]->[256,4,7680] reshape + its inverse costing 8.4% of
    the p128 int8 encode iteration)."""
    x2 = qkv_ref[:]                                 # (bb*n, 3C)
    c = x2.shape[1] // 3
    bb = x2.shape[0] // n
    dh = c // h
    # Sublane packing: at n < 8 a (.., n, ..) score/softmax layout wastes
    # 8-n of every 8-row sublane tile on padding (half the VPU at n=4).
    # Pack pk = 8//n consecutive batches per slab and zero the cross-batch
    # p entries with a multiplicative 0/1 mask after the exp — exact
    # zeros, so p, the row sums, and o are BIT-IDENTICAL to the unpacked
    # computation while the VPU runs full slabs (p128 attention kernel
    # 9.65 -> 5.72 ms per 4 iters measured; rows are batch-major so
    # consecutive batches are contiguous).
    pk = 8 // n if (n < 8 and 8 % n == 0 and bb % (8 // n) == 0) else 1
    nb, bbp = n * pk, bb // pk
    x = x2.reshape(bbp, nb, 3 * c)
    mask = _block_diag_mask(n, pk)
    for g0 in range(0, h, group):
        heads = range(g0, min(g0 + group, h))
        qs = jnp.concatenate([x[:, :, i * dh:(i + 1) * dh] for i in heads])
        ks = jnp.concatenate([x[:, :, c + i * dh:c + (i + 1) * dh]
                              for i in heads])
        vs = jnp.concatenate([x[:, :, 2 * c + i * dh:2 * c + (i + 1) * dh]
                              for i in heads])
        s = jax.lax.dot_general(qs, ks, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p, l_inv = _masked_serving_softmax(s, mask)
        o = jax.lax.dot_general(p.astype(vs.dtype), vs,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * l_inv
        for j, i in enumerate(heads):
            acc_ref[:, i * dh:(i + 1) * dh] = \
                o[j * bbp:(j + 1) * bbp].reshape(bb * n, dh)
    o_all = acc_ref[:]                              # (bb*n, C) f32
    sc = jnp.maximum(jnp.max(jnp.abs(o_all), axis=1, keepdims=True) / 127.0,
                     1e-12)
    oq_ref[:] = jnp.clip(jnp.round(o_all * pl.reciprocal(sc, approx=False)),
                         -127.0, 127.0).astype(jnp.int8)
    s_ref[:] = sc


def fused_qkv_attention_wide_q8_2d(qkv2, n: int, num_heads: int,
                                   scale: float | None = None,
                                   block_b: int | None = None,
                                   interpret: bool = False):
    """:func:`fused_qkv_attention_wide_q8` on the flat serving layout:
    ``qkv2`` is (B*N, 3C) exactly as the int8 qkv matmul emits it, and the
    outputs are (B*N, C) int8 + (B*N, 1) scales exactly as the proj matmul
    consumes them — no (B, N, ...) HBM round trip on either side."""
    bn, c3 = qkv2.shape
    assert bn % n == 0, (bn, n)
    b = bn // n
    c = c3 // 3
    if scale is None:
        scale = (c // num_heads) ** -0.5
    block_b = _wide_block_b(b, n, block_b)
    group = _wide_stack_group(num_heads, block_b, n, c // num_heads,
                              budget=2 << 20)
    rows = block_b * n
    spec_in = pl.BlockSpec((rows, c3), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((rows, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((rows, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_packed_wide_fwd_kernel_stacked_q8_2d, h=num_heads,
                          n=n, scale=float(scale), group=group),
        grid=(b // block_b,),
        in_specs=[spec_in],
        out_specs=[spec_out, spec_s],
        out_shape=[jax.ShapeDtypeStruct((bn, c), jnp.int8),
                   jax.ShapeDtypeStruct((bn, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((rows, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv2)


def _wide_block_b(b: int, n: int, block_b: int | None = None) -> int:
    """Batch-block size for the wide (tiny-N) kernels: ~256 rows of work per
    program, halved until it divides b. ``TAE_TPU_ATTN_WIDE_BB`` overrides."""
    import os

    if block_b is None:
        block_b = int(os.environ.get("TAE_TPU_ATTN_WIDE_BB", "0")) \
            or max(1, min(b, 256 // n))
    while b % block_b:
        block_b //= 2
    return block_b


def _wide_stack_group(h: int, bb: int, n: int, dh: int,
                      budget: int = 3 << 20) -> int:
    """Largest head-group whose stacked temporaries fit ``budget`` bytes."""
    per_head = bb * (3 * n * dh * 2 + n * n * 4 + 2 * n * dh * 4)
    g = max(1, min(h, budget // max(per_head, 1)))
    while h % g:
        g -= 1
    return g


def _packed_bwd_kernel(qkv_ref, o_ref, lse_ref, do_ref, dqkv_ref, *,
                       h: int, scale: float):
    x = qkv_ref[0]                                  # (N, 3C)
    c = x.shape[1] // 3
    dh = c // h
    for i in range(h):
        q = x[:, i * dh:(i + 1) * dh].astype(jnp.float32)
        k = x[:, c + i * dh:c + (i + 1) * dh].astype(jnp.float32)
        v = x[:, 2 * c + i * dh:2 * c + (i + 1) * dh].astype(jnp.float32)
        o = o_ref[0, :, i * dh:(i + 1) * dh].astype(jnp.float32)
        do = do_ref[0, :, i * dh:(i + 1) * dh].astype(jnp.float32)
        lse = lse_ref[0, i]                         # (N, 1)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dt = dqkv_ref.dtype
        dqkv_ref[0, :, i * dh:(i + 1) * dh] = dq.astype(dt)
        dqkv_ref[0, :, c + i * dh:c + (i + 1) * dh] = dk.astype(dt)
        dqkv_ref[0, :, 2 * c + i * dh:2 * c + (i + 1) * dh] = dv.astype(dt)


def _packed_bwd_kernel_stacked(qkv_ref, o_ref, lse_ref, do_ref, dqkv_ref, *,
                               h: int, scale: float, group: int):
    """Head-stacked backward (same restructure as the forward: one slice
    pass per head group, then head-batched dot_generals instead of h
    serial rounds). Grouped because the backward holds ~3 (g, N, N) f32
    score-sized temporaries — the full-h stack needed 24.6M scoped VMEM."""
    x = qkv_ref[0]                                  # (N, 3C)
    c = x.shape[1] // 3
    dh = c // h
    f32 = jnp.float32
    dt = dqkv_ref.dtype
    for g0 in range(0, h, group):
        heads = range(g0, min(g0 + group, h))
        q = jnp.stack([x[:, i * dh:(i + 1) * dh] for i in heads]).astype(f32)
        k = jnp.stack([x[:, c + i * dh:c + (i + 1) * dh]
                       for i in heads]).astype(f32)
        v = jnp.stack([x[:, 2 * c + i * dh:2 * c + (i + 1) * dh]
                       for i in heads]).astype(f32)
        o = jnp.stack([o_ref[0, :, i * dh:(i + 1) * dh]
                       for i in heads]).astype(f32)
        do = jnp.stack([do_ref[0, :, i * dh:(i + 1) * dh]
                        for i in heads]).astype(f32)
        lse = lse_ref[0, g0:g0 + len(heads)]        # (g, N, 1)

        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32) * scale
        p = jnp.exp(s - lse)                        # (g, N, N)
        dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32)
        for j, i in enumerate(heads):
            dqkv_ref[0, :, i * dh:(i + 1) * dh] = dq[j].astype(dt)
            dqkv_ref[0, :, c + i * dh:c + (i + 1) * dh] = dk[j].astype(dt)
            dqkv_ref[0, :, 2 * c + i * dh:2 * c + (i + 1) * dh] = \
                dv[j].astype(dt)


def _bwd_stack_group(h: int, n: int, dh: int, budget: int = 5 << 20) -> int:
    """Largest head-group whose backward temporaries fit ``budget``."""
    per_head = 5 * n * dh * 4 + 3 * n * n * 4 + 3 * n * dh * 4
    g = max(1, min(h, budget // max(per_head, 1)))
    while h % g:
        g -= 1
    return g


def _packed_spec(n: int, c: int):
    return pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _lse_spec3(h: int, n: int):
    return pl.BlockSpec((1, h, n, 1), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _packed_fwd_call(qkv, h: int, scale: float, with_lse: bool,
                     interpret: bool, serving: bool = True):
    b, n, c3 = qkv.shape
    c = c3 // 3
    out_shape = [jax.ShapeDtypeStruct((b, n, c), qkv.dtype)]
    out_specs = [_packed_spec(n, c)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32))
        out_specs.append(_lse_spec3(h, n))
    import os

    # head-stacked is the measured default (p16 encode +3% bf16 / +8% int8
    # vs the per-head loop); "loop" keeps the old body for comparison
    if os.environ.get("TAE_TPU_PACKED_ATTN") == "loop":
        body = _packed_fwd_kernel          # loop body is always exact
    else:
        body = functools.partial(_packed_fwd_kernel_stacked, serving=serving)
    kernel = functools.partial(body, h=h, scale=scale, with_lse=False)
    if with_lse:
        kernel = lambda qr, or_, lr: body(  # noqa: E731
            qr, or_, h=h, scale=scale, with_lse=True, lse_ref=lr)
    res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[_packed_spec(n, c3)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv)
    return res if with_lse else (res[0], None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_qkv_attention_wide(qkv, num_heads: int, scale: float | None = None,
                             block_b: int | None = None,
                             interpret: bool = False, serving: bool = True):
    """(B, N, 3C) packed qkv -> (B, N, C) for tiny N: ``block_b`` batch
    elements per program so program count (and its ~20µs overhead each)
    drops by that factor. Measured on v5e vs the XLA small-N path: +18%
    end-to-end p64 int8 encode, +1.3% p128 bf16. The backward recomputes
    through the XLA reference (training at tiny N was the XLA path before,
    so gradient cost is unchanged; the kernel speeds up every forward).

    ``serving=True`` (the int8-block path) uses the clamped constant-shift
    softmax (_serving_softmax); pass ``serving=False`` on any path that can
    be differentiated (the bf16 attention_apply dispatch) so the forward
    matches the XLA-reference backward for ARBITRARY scores, not just those
    inside the serving clamps."""
    import os

    b, n, c3 = qkv.shape
    c = c3 // 3
    if scale is None:
        scale = (c // num_heads) ** -0.5
    block_b = _wide_block_b(b, n, block_b)
    spec3 = pl.BlockSpec((block_b, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    speco = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if os.environ.get("TAE_TPU_PACKED_ATTN") == "loop":
        wide_body = functools.partial(_packed_wide_fwd_kernel, h=num_heads,
                                      scale=float(scale))
    else:
        group = _wide_stack_group(num_heads, block_b, n, c // num_heads)
        wide_body = functools.partial(_packed_wide_fwd_kernel_stacked,
                                      h=num_heads, scale=float(scale),
                                      group=group, serving=serving)
    return pl.pallas_call(
        wide_body,
        grid=(b // block_b,),
        in_specs=[spec3],
        out_specs=speco,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv)


def _wide_reference(qkv, h: int, scale):
    from tae_tpu.ops.attention import attention_xla

    b, n, c3 = qkv.shape
    c = c3 // 3
    r = qkv.reshape(b, n, 3, h, c // h).transpose(2, 0, 3, 1, 4)
    y = attention_xla(r[0], r[1], r[2], scale)
    return y.transpose(0, 2, 1, 3).reshape(b, n, c)


def _wide_vjp_fwd(qkv, num_heads, scale, block_b, interpret, serving):
    return (fused_qkv_attention_wide(qkv, num_heads, scale, block_b,
                                     interpret, serving), (qkv,))


def _wide_vjp_bwd(num_heads, scale, block_b, interpret, serving, residuals,
                  do):
    (qkv,) = residuals
    _, vjp = jax.vjp(lambda q: _wide_reference(q, num_heads, scale), qkv)
    return vjp(do)


fused_qkv_attention_wide.defvjp(_wide_vjp_fwd, _wide_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_qkv_attention(qkv, num_heads: int, scale: float | None = None,
                        interpret: bool = False, serving: bool = True):
    """(B, N, 3C) packed qkv -> (B, N, C) attention output, head split/merge
    fused into the kernel.

    ``serving=True`` (the int8-block path) uses the clamped constant-shift
    softmax; pass ``serving=False`` on the differentiable bf16 dispatch
    (attention_apply) so the non-LSE primal matches the exact-softmax
    custom-VJP forward for arbitrary scores — trained models with attention
    logits outside the serving clamps must not see a silently different
    eval/serving output."""
    if scale is None:
        scale = (qkv.shape[-1] // 3 // num_heads) ** -0.5
    o, _ = _packed_fwd_call(qkv, num_heads, float(scale), False, interpret,
                            serving=serving)
    return o


def _packed_vjp_fwd(qkv, num_heads, scale, interpret, serving):
    if scale is None:
        scale = (qkv.shape[-1] // 3 // num_heads) ** -0.5
    o, lse = _packed_fwd_call(qkv, num_heads, float(scale), True, interpret)
    return o, (qkv, o, lse)


def _packed_vjp_bwd(num_heads, scale, interpret, serving, residuals, do):
    qkv, o, lse = residuals
    b, n, c3 = qkv.shape
    if scale is None:
        scale = (c3 // 3 // num_heads) ** -0.5
    import os

    if os.environ.get("TAE_TPU_PACKED_ATTN") == "loop":
        bwd_body = functools.partial(_packed_bwd_kernel, h=num_heads,
                                     scale=float(scale))
    else:
        grp = _bwd_stack_group(num_heads, n, c3 // 3 // num_heads)
        bwd_body = functools.partial(_packed_bwd_kernel_stacked, h=num_heads,
                                     scale=float(scale), group=grp)
    dqkv = pl.pallas_call(
        bwd_body,
        grid=(b,),
        in_specs=[_packed_spec(n, c3), _packed_spec(n, c3 // 3),
                  _lse_spec3(num_heads, n), _packed_spec(n, c3 // 3)],
        out_specs=[_packed_spec(n, c3)],
        out_shape=[jax.ShapeDtypeStruct((b, n, c3), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=interpret,
    )(qkv, o, lse, do)[0]
    return (dqkv,)


fused_qkv_attention.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)
