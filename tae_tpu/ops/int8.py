"""int8 quantized inference (w8a8, dynamic activation scales).

Serving-path superset: the TPU MXU runs int8×int8→int32 at ~2× the bf16
rate, and the tokenizer encode path (reference encode.py; BASELINE.json's
≥10k img/s/chip north star) is MXU-bound. Scheme:

  * weights: static symmetric per-output-channel int8
    (``w_q = round(w / s_w)``, one fp32 scale per column);
  * activations: dynamic symmetric per-row int8 computed on the fly;
  * matmul in int8 -> int32 accumulate, rescaled by ``s_x · s_w``.

Quantized layers are drop-in: :func:`quantize_params` rewrites ``{"w": ...}``
linear leaves to ``{"w_q", "w_scale"(, "b")}``, and
``tae_tpu.nn.vit.linear_apply`` dispatches on the key. Everything else
(LayerNorm, pos-embeds, softmax) stays in bf16/fp32. Off by default; enable
via ``Tokenizer.from_checkpoint(..., quantization="int8")``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) fp weight -> (int8 weight, (out,) fp32 per-channel scales)."""
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def int8_linear_xla(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                    bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference/fallback path (unfused; no faster than bf16 — the
    quantize/rescale passes cost what the int8 dot saves)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def vmem_limit() -> int:
    """Per-kernel Mosaic scoped-VMEM limit (bytes) — every int8/int4 kernel
    passes this as ``CompilerParams.vmem_limit_bytes``. Mosaic's default is
    a conservative 16M, but the v5e physically has far more: 32M-, 48M- and
    128M-footprint kernels all compile AND run correctly (measured on-chip,
    r3), and the extra room buys larger blockings — fewer weight restreams
    and accumulator passes (standalone p16 MLP bh 2048 measured 1.617 vs
    1.746 ms at bh 1024). Default 32M: 128M-scale blocks pipeline WORSE
    (2.095 ms — DMA/compute overlap dies), and 32M leaves headroom for
    XLA's own VMEM use around the kernel. ``TAE_TPU_I8_VMEM_LIMIT``
    overrides. Raising the limit also retires the r2/r3 class of
    graph-dependent scoped-OOMs at the 16M boundary (Mosaic's true
    footprint runs ~4% over the analytic model in some graphs)."""
    import os

    return int(os.environ.get("TAE_TPU_I8_VMEM_LIMIT") or (32 << 20))


def _block(dim: int, cap: int) -> int:
    """Largest lane-valid block <= cap that divides dim: Mosaic requires the
    last block dim to be a multiple of 128 or equal to the full array dim
    (caught by a real-TPU drive of a tiny model: dim 192 used to pick 64).
    A cap below 128 clamps up to the smallest lane-valid block rather than
    falling through to the whole dim (the maximal VMEM footprint — the
    opposite of what a small-cap request wants)."""
    b = max(128, (cap // 128) * 128)
    while b >= 128:
        if dim % b == 0:
            return b
        b -= 128
    return dim


def _block_k(dim: int, cap: int = 4096) -> int:
    """K blocks want to be as large as VMEM allows: full-K when it fits
    (measured fastest — no accumulator revisits), else halve until it does."""
    b = dim
    while b > cap and b % 2 == 0:
        b //= 2
    if b <= cap and dim % b == 0 and (b == dim or b % 128 == 0):
        return b
    return _block(dim, cap)


def _plan_blocks(m: int, k: int, n: int, out_bytes: int = 2,
                 has_residual: bool = False,
                 budget: int | None = None) -> tuple[int, int, int]:
    """Choose (bm, bn, bk) minimizing estimated HBM traffic under a VMEM
    budget. In the (M/bm, N/bn, K/bk) grid the weight re-streams ceil(m/bm)
    times and the activation ceil(n/bn) times, so the r2 fixed bm=256 left
    the large-M encode configs HBM-bound: at p16 (m=32768) the qkv weight
    streamed 128x (~384 MB redundant traffic — profiled at 72% of int8 peak
    where the MLP kernel hits 84%). Small m keeps the one-m-block behavior
    (the r2c serve-latency fix) automatically: m/bm = 1 minimizes weight
    traffic. ``TAE_TPU_I8_BM``/``TAE_TPU_I8_BN`` override for on-chip
    tuning."""
    import os

    bk = _block_k(k)
    env_bm, env_bn = (os.environ.get("TAE_TPU_I8_BM"),
                      os.environ.get("TAE_TPU_I8_BN"))
    # an explicit budget (argument or TAE_TPU_I8_VMEM_BUDGET) is a tuning
    # override: it must not be re-clamped below
    explicit_budget = (budget is not None
                       or "TAE_TPU_I8_VMEM_BUDGET" in os.environ)
    if budget is None:
        # 7/8 of the kernel vmem limit: the empirical footprint model ran
        # ~2-4% under Mosaic's real allocation in observed graphs, so keep
        # a proportional margin (14M at the historical 16M limit — the
        # setting every r3 plan was validated under — 28M at today's 32M)
        budget = int(os.environ.get("TAE_TPU_I8_VMEM_BUDGET",
                                    vmem_limit() * 7 // 8))
    m_pad = -(-m // 32) * 32
    if m_pad <= 256 and not (env_bm or env_bn):
        # small-batch serving latency regime: weight-DMA-bound, one m-block
        # either way; keep the r2c-measured blocking (bn 768 measured -11%
        # on serve_p64_int8_b8)
        return m_pad, _block(n, 512), bk
    if m_pad <= 1024 and not explicit_budget:
        # small-M encode regime: the 28M-budget plans the 32M vmem limit
        # enables measured -7.5% on p128 b256 (m=1024) while the same
        # budget gained +4-6% at m>=2048 — with few m-blocks the bigger
        # tiles starve grid-level DMA/compute overlap that the traffic
        # model doesn't see. Keep the r3-validated 14M budget here.
        budget = min(budget, 14 << 20)
    best = None
    for bm_c in ((int(env_bm),) if env_bm else (2048, 1024, 512, 256)):
        bm = min(bm_c, m_pad)
        for bn_cap in ((int(env_bn),) if env_bn
                       else (2048, 1536, 1024, 768, 512, 256)):
            bn = _block(n, bn_cap)
            # empirical Mosaic footprint model, calibrated against observed
            # compile pass/fails on v5e: ~3x the x block (double-buffer +
            # epilogue copy), double-buffered weight block, int32
            # accumulator, double-buffered out (bm=1024, bk=3072, bn=512
            # measured 16.36M actual vs 13.4M with a naive 2x-in model)
            vmem = (3 * bm * bk + 2 * bk * bn + 4 * bm * bn
                    + 2 * out_bytes * bm * bn
                    + (2 * bm * bn * 2 if has_residual else 0))
            if vmem > budget:
                continue
            traffic = (-(-m_pad // bm) * k * n      # weight re-streams
                       + -(-n // bn) * m_pad * k    # activation re-streams
                       + m_pad * n * out_bytes)
            key = (traffic, -bm, -bn)
            if best is None or key < best[0]:
                best = (key, (bm, bn, bk))
    if best is None:  # tiny-VMEM corner: fall back to the r2 blocking
        return min(256, m_pad), _block(n, 512), bk
    return best[1]


def _ln_chain_plan(m_pad: int, k: int, n: int, out_el: int,
                   has_res: bool) -> tuple[int, int, int] | None:
    """Feasible (bm, n, bk) for the LN-chained epilogue (needs a FULL
    feature row per block, bn == n) under the same empirical VMEM model
    plus the epilogue's LN temporaries and extra (bm, n) s8 output."""
    import os

    if os.environ.get("TAE_TPU_LN_CHAIN") == "0":
        return None  # kill-switch for the chained epilogues
    budget = int(os.environ.get("TAE_TPU_I8_VMEM_BUDGET",
                                vmem_limit() * 7 // 8))
    bk = _block_k(k)
    # Pad-free bm first: a bm that does not divide m forces a full (M, n)
    # pad + slice materialization around the kernel — measured ~6% of p32
    # int8 encode when the proj chain picked bm 768 against m 8192.
    cands = (1024, 768, 512, 384, 256, 128, 64, 32)
    for bm_c in ([c for c in cands if m_pad % c == 0]
                 + [c for c in cands if m_pad % c != 0]):
        bm = min(bm_c, m_pad)
        vm = (3 * bm * bk + 2 * bk * n + 4 * bm * n + 2 * out_el * bm * n
              + (2 * bm * n * 2 if has_res else 0)
              + 8 * bm * n + 2 * 128 * n)
        if vm <= budget:
            return bm, n, bk
    return None


def int8_linear(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bias: jnp.ndarray | None = None,
                backend: str | None = None,
                x_scale: jnp.ndarray | None = None,
                residual: jnp.ndarray | None = None,
                out_dtype=None, q8_out: bool = False,
                interpret: bool = False, ln_out=None):
    """x (..., in) @ int8 weight. Dispatches to the fused Pallas matmul on
    TPU (activation quantization in VMEM, int8 weight streaming, fused
    dequant epilogue); XLA fallback elsewhere.

    ``x_scale``: (..., 1) per-row scales for already-int8 x (skips the
    quantize pass entirely — pair with ln_quant). ``residual``: (..., out)
    added in the epilogue (fused residual connection). ``q8_out``: emit
    ``(int8 y, (out/512, M, 1) fp32 per-(row, n-block) scales)`` instead of
    a float array — for consumers that dequantize in VMEM (the int8-input
    attention kernels); Pallas path only."""
    from tae_tpu.ops.attention import default_backend

    if not interpret and (backend or default_backend()) != "pallas":
        if q8_out:
            # not an assert: must survive python -O, and the XLA fallback
            # would silently return a float array where the caller expects
            # an (int8, scales) tuple
            raise ValueError("q8_out requires the Pallas path")
        if x_scale is not None:
            x = x.astype(jnp.float32) * x_scale  # dequantize, then requantize
        y = int8_linear_xla(x, w_q, w_scale, bias)
        if out_dtype is not None:
            y = y.astype(out_dtype)
        y = y + residual.astype(y.dtype) if residual is not None else y
        return (y, None, None) if ln_out is not None else y

    from tae_tpu.ops.pallas.int8_matmul import int8_matmul_fused

    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w_q.shape[-1]
    x2 = x.reshape(-1, k)
    sx2 = x_scale.reshape(-1, 1) if x_scale is not None else None
    res2 = residual.reshape(-1, n) if residual is not None else None
    m = x2.shape[0]
    out_el = jnp.dtype(out_dtype or (x.dtype if x_scale is None
                                     else jnp.bfloat16)).itemsize
    requested_ln = ln_out is not None  # caller expects a 3-tuple iff set
    want_ln = requested_ln
    if want_ln:
        plan = _ln_chain_plan(-(-m // 32) * 32, k, n,
                              jnp.dtype(out_dtype or jnp.bfloat16).itemsize,
                              res2 is not None)
        if plan is None:
            want_ln, ln_out = False, None
    if want_ln:
        bm, bn, bk = plan
    elif q8_out:
        # q8_out scale blocks are part of the consumer contract
        # (fused_qkv_attention_i8 requires bn % dh == 0 with bn=_block(n,512))
        # — keep the r2 blocking there
        bm = 256 if m >= 256 else -(-m // 32) * 32
        bm, bn, bk = min(bm, -(-m // 32) * 32), _block(n, 512), _block_k(k)
    else:
        # traffic-minimizing blocks (see _plan_blocks): fixed bm=256 left
        # the large-M configs weight-restream-bound (p16 qkv: 128x restream)
        bm, bn, bk = _plan_blocks(m, k, n, out_bytes=out_el,
                                  has_residual=res2 is not None)
    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if sx2 is not None:
            sx2 = jnp.pad(sx2, ((0, pad), (0, 0)), constant_values=1.0)
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
    # full-K blocks (VMEM-capped) avoid accumulator revisits and repeated
    # activation quantization — measured 258 T/s vs 190 T/s XLA bf16 on v5e
    # at (2048,2560)x(2560,10240); small block_k configurations only tie bf16
    y = int8_matmul_fused(x2, w_q, w_scale, bias,
                          block_m=min(bm, x2.shape[0]),
                          block_n=bn, block_k=bk,
                          out_dtype=out_dtype or (x.dtype if x_scale is None
                                                  else jnp.bfloat16),
                          x_scale=sx2, residual=res2, q8_out=q8_out,
                          interpret=interpret, ln_out=ln_out)
    if want_ln:
        y, nq, ns = y
        if pad:
            y, nq, ns = y[:m], nq[:m], ns[:m]
        return (y.reshape(*lead, n), nq.reshape(*lead, n),
                ns.reshape(*lead, 1))
    if q8_out:
        yq, ys = y
        if pad:
            yq, ys = yq[:m], ys[:, :m]
        return yq.reshape(*lead, n), ys
    if pad:
        y = y[:m]
    res_out = y.reshape(*lead, n)
    return (res_out, None, None) if requested_ln else res_out


def equalize_params(params: Params, alpha: float = 0.5,
                    act_amax: Params | None = None) -> Params:
    """SmoothQuant-style activation-outlier equalization on the FLOAT param
    tree, applied before :func:`quantize_params` (shared by the int8 w8a8 and
    int4 w4a8 paths — both quantize activations per-row, so one huge channel
    sets every other channel's step size).

    Every pre-LN pair in the tree — (norm1 → attn.qkv) and (norm2 → mlp.fc1)
    inside transformer blocks, plus the final (norm → dict_proj/pred/head)
    pairs — is rewritten with per-input-channel factors ``s``::

        gamma' = gamma / s      beta' = beta / s      W'[c, :] = s_c · W[c, :]

    which is mathematically exact (``LN'(x) @ W' == LN(x) @ W`` in real
    arithmetic; bf16 forward changes only by rounding) while the activation
    quantizer sees a per-channel-flattened range.

    ``s_c = amax_x(c)^alpha / amax_w(c)^(1-alpha)`` (SmoothQuant eq. 4,
    arXiv:2211.10438). ``amax_x`` comes from ``act_amax`` when given — a tree
    of the same structure as ``params`` where each *linear* dict that should
    be equalized carries an ``(…, in)`` per-channel activation amax under
    ``"x_amax"`` — and otherwise from the LN affine itself (``|gamma| +
    |beta|``): LN output channels are proportional to ``gamma`` in
    expectation (the row-normalized ``z`` is ~unit-scale per channel), so the
    affine predicts the outlier channels without any calibration data.
    Channels with degenerate stats keep ``s = 1``.

    The reference has no quantized path (serving superset; reference
    encode.py:76-91 runs fp16 autocast)."""

    def factors(ax, w):
        aw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)  # (…, in)
        s = ax ** alpha / jnp.maximum(aw, 1e-12) ** (1.0 - alpha)
        ok = (ax > 1e-6) & (aw > 1e-12) & jnp.isfinite(s)
        return jnp.where(ok, jnp.clip(s, 1e-4, 1e4), 1.0)

    def equalize(norm, lin, lin_amax):
        g, b = norm["scale"], norm["bias"]
        if lin_amax is not None and "x_amax" in lin_amax:
            ax = lin_amax["x_amax"].astype(jnp.float32)
        else:
            ax = jnp.abs(g.astype(jnp.float32)) + jnp.abs(b.astype(jnp.float32))
        s = factors(ax, lin["w"])
        norm2 = {"scale": (g / s).astype(g.dtype), "bias": (b / s).astype(b.dtype)}
        lin2 = dict(lin)
        lin2["w"] = (lin["w"].astype(jnp.float32) * s[..., None]).astype(lin["w"].dtype)
        return norm2, lin2

    def sub(stats, key):
        return stats.get(key) if isinstance(stats, dict) else None

    def walk(node, stats):
        if not isinstance(node, dict):
            return node
        out = dict(node)
        if "norm1" in node and "attn" in node and "w" in node["attn"].get("qkv", {}):
            out["attn"] = dict(node["attn"])
            out["norm1"], out["attn"]["qkv"] = equalize(
                node["norm1"], node["attn"]["qkv"], sub(sub(stats, "attn"), "qkv"))
        if "norm2" in node and "w" in node.get("mlp", {}).get("fc1", {}):
            out["mlp"] = dict(node["mlp"])
            out["norm2"], out["mlp"]["fc1"] = equalize(
                node["norm2"], node["mlp"]["fc1"], sub(sub(stats, "mlp"), "fc1"))
        if "norm" in node and isinstance(node["norm"], dict) \
                and "scale" in node["norm"]:
            for head in ("dict_proj", "pred", "head"):
                if "w" in node.get(head, {}):
                    out["norm"], out[head] = equalize(
                        node["norm"], node[head], sub(stats, head))
                    break
        for k, v in node.items():
            if k not in ("norm1", "attn", "norm2", "mlp", "norm",
                         "dict_proj", "pred", "head"):
                out[k] = walk(v, sub(stats, k))
            elif k in ("attn", "mlp") and out[k] is node[k]:
                out[k] = walk(v, sub(stats, k))
        return out

    return walk(params, act_amax)


def prepare_serving_params(params: Params, quantization: str,
                           equalize: float | bool = 0.0,
                           act_amax: Params | None = None,
                           patch_input: bool = False) -> Params:
    """The canonical serving rewrite, in order: (optional) SmoothQuant-style
    equalization -> int8/int4 quantization -> per-layer unstacked serving
    layout. ONE definition shared by ``Tokenizer.from_checkpoint``, the
    encode CLI, and the frozen-encoder trainers — keep them from drifting.
    ``equalize``: falsy = off, True = alpha 0.5, number = alpha.

    ``patch_input=True`` declares the deployment feeds pre-patchified
    (B, N, C*p*p) batches (the native decoder's --patch_layout), where the
    patch embed is a plain matmul with no relayout ahead of the activation
    quantize — so int8 mode quantizes it too instead of the default bf16
    skip (measured p64 encode 4946 -> 5259 img/s, +6.3%; p128 +0.8%; latent
    rel err 1.4e-2 -> 1.7e-2 on a p128-shaped model). int4 mode ignores it
    (the int4 packer only covers transformer-block weights)."""
    if quantization not in ("int8", "int4"):
        raise ValueError(f"unknown quantization mode {quantization!r}")
    if equalize:
        alpha = 0.5 if equalize is True else float(equalize)
        if act_amax is not None:
            params = jax.jit(
                lambda p, a: equalize_params(p, alpha, act_amax=a)
            )(params, act_amax)
        else:
            params = jax.jit(lambda p: equalize_params(p, alpha))(params)
    if quantization == "int4":
        from tae_tpu.ops.int4 import quantize_params_int4

        params = jax.jit(quantize_params_int4)(params)
    else:
        skip = () if patch_input else ("patch_embed",)
        params = jax.jit(lambda p: quantize_params(p, skip=skip))(params)
    return unstack_blocks(params)


def unstack_blocks(params: Params, key: str = "blocks") -> Params:
    """Rewrite every depth-stacked ``blocks`` sub-tree into a list of
    per-layer trees (serving layout: each layer's weights become root
    buffers, so the scan's per-layer dynamic-slice copies — which Pallas
    operands cannot alias, profiled ~8% of int8 encode — disappear;
    ``tae_tpu.nn.vit.blocks_apply`` accepts both layouts)."""
    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == key and isinstance(v, dict):
                    depth = jax.tree.leaves(v)[0].shape[0]
                    out[k] = [jax.tree.map(lambda x, i=i: x[i], v)
                              for i in range(depth)]
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def quantize_params(params: Params, skip: tuple[str, ...] = ("patch_embed",)
                    ) -> Params:
    """Rewrite every linear ``{"w": (in, out), ["b"]}`` leaf-dict to its int8
    form. Depth-stacked linears (the ``(depth, in, out)`` leaves produced by
    ``tae_tpu.nn.vit.blocks_init`` — i.e. every transformer block weight) are
    quantized per layer via vmap. Non-matrix params (norms, embeddings,
    codebook) pass through.

    ``skip`` names sub-trees kept in the float path. Default skips
    ``patch_embed``: with image-layout input, quantizing it forces the patch
    relayout to materialize in fp32 ahead of the quantize pass (profiled
    ~2.4% of p64 int8 encode), while in bf16 the relayout folds into the
    einsum patch embed. With pre-patchified input there is no relayout and
    quantizing it WINS (+6.3% p64) — ``prepare_serving_params``'s
    ``patch_input=True`` passes ``skip=()`` for that case."""
    def walk(node, name=""):
        if name in skip:
            return node
        if isinstance(node, dict):
            ndim = getattr(node.get("w"), "ndim", 0)
            if ndim in (2, 3):
                qfn = quantize_weight if ndim == 2 else jax.vmap(quantize_weight)
                wq, scale = qfn(node["w"])
                out: Params = {"w_q": wq, "w_scale": scale}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
