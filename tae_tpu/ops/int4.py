"""int4 weight quantization (w4a8, group-wise scales) — serving superset.

Small-batch serving of the 3.4-4B configs is weight-streaming-bound (the
whole reason batch-1 p64 latency is ~4 ms at 3.4 GB of int8 weights over
~820 GB/s HBM; see CLAUDE.md measured latencies). Halving weight bytes is
the only lever left at that operating point, so this path stores the
transformer-block matmul weights as packed int4:

  * weights: static symmetric int4 in [-7, 7], **group-wise** fp32 scales —
    one scale per (group of ``group`` input rows, output channel). Group
    scales recover most of the accuracy per-channel int4 loses: the scale
    adapts to each K-slice's dynamic range instead of one max dominating
    the whole column.
  * packing: two int4 per int8 byte in a **nibble-plane** layout — byte row
    ``r`` of a (K/2, N) int8 array holds ``w[r]`` in its low nibble and
    ``w[r + K/2]`` in its high nibble. Unpacking therefore never interleaves
    rows: each nibble plane is a contiguous K-slice, which is what lets the
    Pallas kernels run plane-local MXU dots on static slices (Mosaic cannot
    shuffle sublanes cheaply).
  * byte encoding: **offset-8 low nibble** — ``byte = 16·hi + (lo + 8)`` as
    a signed int8 (range [-111, 127] for hi, lo ∈ [-7, 7]). Decode is then
    2 VPU ops per plane on the sign-extended byte: ``hi = b >> 4`` (exact
    arithmetic-shift floor division, because the remainder ``lo + 8`` is
    in [1, 15]) and ``lo = (b & 15) - 8`` — vs 4-5 ops/plane for the
    mask+sign-extend decode of a plain two's-complement nibble pack. The
    decode is the dominant VPU cost of the int4 kernels (docs/KERNELS.md),
    which is why the byte layout is chosen for decode cost, not readability.
  * activations: dynamic per-row int8 exactly like the int8 path (the int4
    trade is weight *bytes*, not activation precision).
  * matmul: int8×int8→int32 per group on the MXU (int4 operands are
    sign-extended to int8 in VMEM), fp32 group accumulation — exact, since
    a group partial sum is ≤ 128·127·7 < 2^24.

Accuracy: int4 is a coarser code than int8 (expect ~3-5x the int8 path's
3e-2 latent relative error; measured numbers in docs/KERNELS.md). It is an
opt-in latency configuration for the weight-bound regime
(``Tokenizer.from_checkpoint(..., quantization="int4")``), not a default.

Layer selection: only the depth-stacked transformer-block linears
(qkv/proj/fc1/fc2 — >95% of weight bytes) go int4; embeddings/heads keep
the int8 form and patch_embed stays bf16 (same rationale as
:func:`tae_tpu.ops.int8.quantize_params`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from tae_tpu.ops.int8 import _block, quantize_weight

Params = dict[str, Any]

#: default max group size (input rows sharing one scale per output channel)
GROUP = 256


def group_size(half_k: int, cap: int = GROUP) -> int:
    """Largest lane-valid group <= cap dividing the nibble-plane row count
    (groups must not straddle the lo/hi plane boundary)."""
    return _block(half_k, cap)


def quantize_weight_int4(w: jnp.ndarray, group: int | None = None
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) fp weight -> (packed (K/2, N) int8, (K/G, N) fp32 scales).

    K must be even; the effective group divides K/2 (plane-aligned)."""
    k, n = w.shape
    if k % 2:
        raise ValueError(f"int4 packing needs an even input dim, got {k}")
    g = group or group_size(k // 2)
    if (k // 2) % g:
        raise ValueError(f"group {g} must divide the plane size {k // 2}")
    w32 = w.astype(jnp.float32).reshape(k // g, g, n)
    scale = jnp.max(jnp.abs(w32), axis=1) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale[:, None]), -7, 7).astype(jnp.int32)
    q = q.reshape(k, n)
    lo, hi = q[: k // 2], q[k // 2:]
    byte = hi * 16 + (lo + 8)                          # [-111, 127]
    packed = byte.astype(jnp.int8)
    return packed, scale


def unpack_int4(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K/2, N) packed bytes -> (lo, hi) int8 nibble planes in [-7, 7].

    Offset-8 decode (see module docstring): on the sign-extended byte,
    ``b >> 4`` is an exact floor division by 16 because the low-nibble
    remainder ``lo + 8`` is in [1, 15]."""
    b = packed.astype(jnp.int32)
    lo = (b & 15) - 8
    hi = b >> 4
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def dequantize_int4(packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Packed int4 + group scales -> (K, N) fp32 weights (reference path)."""
    lo, hi = unpack_int4(packed)
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    k, n = q.shape
    g = k // scale.shape[0]
    return (q.reshape(-1, g, n) * scale[:, None]).reshape(k, n)


def int4_linear_xla(x: jnp.ndarray, w4: jnp.ndarray, w_scale: jnp.ndarray,
                    bias: jnp.ndarray | None = None,
                    x_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference/fallback: dequantize-to-fp32 matmul with the same w4a8
    activation quantization as the kernel (per-row int8)."""
    orig_dtype = x.dtype if x_scale is None else jnp.bfloat16
    if x_scale is None:
        x32 = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0,
                         1e-12)
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127)
    else:
        xq, sx = x.astype(jnp.float32), x_scale
    w = dequantize_int4(w4, w_scale)
    y = jax.lax.dot_general(xq.astype(jnp.float32), w,
                            (((xq.ndim - 1,), (0,)), ((), ()))) * sx
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def int4_linear(x: jnp.ndarray, w4: jnp.ndarray, w_scale: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                backend: str | None = None,
                x_scale: jnp.ndarray | None = None,
                residual: jnp.ndarray | None = None,
                out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x (..., K) @ packed-int4 weight; Pallas on TPU, XLA fallback.

    Same contract as :func:`tae_tpu.ops.int8.int8_linear` (``x_scale`` for
    pre-quantized int8 inputs, fused ``residual`` epilogue)."""
    from tae_tpu.ops.attention import default_backend

    if not interpret and (backend or default_backend()) != "pallas":
        if x_scale is not None:
            y = int4_linear_xla(x, w4, w_scale, bias, x_scale=x_scale)
        else:
            y = int4_linear_xla(x, w4, w_scale, bias)
        if out_dtype is not None:
            y = y.astype(out_dtype)
        return y + residual.astype(y.dtype) if residual is not None else y

    from tae_tpu.ops.pallas.int4_matmul import int4_matmul_fused

    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w4.shape[-1]
    x2 = x.reshape(-1, k)
    sx2 = x_scale.reshape(-1, 1) if x_scale is not None else None
    res2 = residual.reshape(-1, n) if residual is not None else None
    m = x2.shape[0]
    # single m-block at small batch (weights restream once per m-block;
    # see the identical fix in tae_tpu.ops.int8.int8_linear)
    bm = 256 if m >= 256 else -(-m // 32) * 32
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if sx2 is not None:
            sx2 = jnp.pad(sx2, ((0, pad), (0, 0)), constant_values=1.0)
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
    y = int4_matmul_fused(x2, w4, w_scale, bias,
                          block_m=min(bm, x2.shape[0]),
                          block_n=_block(n, 512),
                          out_dtype=out_dtype or (x.dtype if x_scale is None
                                                  else jnp.bfloat16),
                          x_scale=sx2, residual=res2, interpret=interpret)
    if pad:
        y = y[:m]
    return y.reshape(*lead, n)


def _int4_ok(w: jnp.ndarray) -> bool:
    """Whether a (possibly depth-stacked) weight fits the int4 layout
    constraints: even K and a 128-multiple nibble plane, so the group is
    lane-valid for the Pallas kernels on every platform (the quantization
    decision must not depend on where the tree is later applied)."""
    k = w.shape[-2]
    return k % 2 == 0 and (k // 2) % 128 == 0


def quantize_params_int4(params: Params, skip: tuple[str, ...] = ("patch_embed",)
                         ) -> Params:
    """Rewrite linears to quantized form: transformer-block matmuls
    (under any ``blocks`` sub-tree) become int4 ``{"w4", "w4_scale"[, "b"]}``;
    every other linear takes the int8 form (same bytes as the int8 path for
    the <5% of weights outside the blocks); ``skip`` sub-trees stay float.

    Drop-in with the int8 layout: ``tae_tpu.nn.vit`` dispatches per-leaf on
    the ``w4``/``w_q`` keys, so mixed trees apply transparently."""
    def walk(node, name="", in_blocks=False):
        if name in skip:
            return node
        if isinstance(node, dict):
            w = node.get("w")
            ndim = getattr(w, "ndim", 0)
            if ndim in (2, 3):
                if in_blocks and _int4_ok(w):
                    qfn = (quantize_weight_int4 if ndim == 2
                           else jax.vmap(lambda x: quantize_weight_int4(x)))
                    w4, scale = qfn(w)
                    out: Params = {"w4": w4, "w4_scale": scale}
                else:
                    qfn = quantize_weight if ndim == 2 else jax.vmap(quantize_weight)
                    wq, scale = qfn(w)
                    out = {"w_q": wq, "w_scale": scale}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v, k, in_blocks or k == "blocks")
                    for k, v in node.items()}
        return node

    return walk(params)
