"""Pure-functional ViT primitives (patch embed, attention, MLP, block).

Functional counterparts of the reference's module classes
(reference tae.py:29-131): every layer is an ``*_init(key, ...) -> params``
plus an ``*_apply(params, x, ...) -> y`` pair operating on plain dict
pytrees. Transformer stacks are stored depth-stacked (leading layer axis) and
applied with ``lax.scan`` so a 22-deep model traces/compiles a single block.

Conventions:
  * Linear weights are stored (in, out) — JAX layout; the torch importer
    transposes.
  * The fused qkv projection is one (dim, 3·dim) matmul, packed [q|k|v] along
    the output axis (column-split equivalent of the reference's row-packed
    torch layout, tae.py:67,74).
  * GELU is the exact (erf) variant — torch ``nn.GELU`` default; note
    ``jax.nn.gelu`` defaults to the tanh approximation, so we always pass
    ``approximate=False``.
  * LayerNorm statistics run in fp32 (see :mod:`tae_tpu.ops.layernorm`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp

from tae_tpu.nn import init as tinit
from tae_tpu.ops.attention import attention
from tae_tpu.ops.layernorm import layer_norm
from tae_tpu.ops.patchify import extract_patches

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    ln_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    ln_eps: float = 1e-6

    @property
    def attn(self) -> AttentionConfig:
        return AttentionConfig(self.dim, self.num_heads, self.qkv_bias,
                               self.qk_norm, self.ln_eps)

    @property
    def mlp_hidden(self) -> int:
        return int(self.dim * self.mlp_ratio)


# ---------------------------------------------------------------------------
# linear / layernorm
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    p: Params = {"w": tinit.xavier_uniform(key, (in_dim, out_dim), dtype)}
    if bias:
        p["b"] = tinit.zeros((out_dim,), dtype)
    return p


def linear_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q" in p:  # int8-quantized weights (tae_tpu.ops.int8)
        from tae_tpu.ops.int8 import int8_linear

        return int8_linear(x, p["w_q"], p["w_scale"], p.get("b"))
    if "w4" in p:  # packed-int4 weights (tae_tpu.ops.int4)
        from tae_tpu.ops.int4 import int4_linear

        return int4_linear(x, p["w4"], p["w4_scale"], p.get("b"))
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _qlinear(p: Params, x: jnp.ndarray, x_scale=None, residual=None,
             out_dtype=None, backend: str | None = None,
             interpret: bool = False) -> jnp.ndarray:
    """Quantized linear dispatching on the leaf layout (w_q: int8 / w4:
    packed int4) with the shared fused-epilogue contract."""
    if "w4" in p:
        from tae_tpu.ops.int4 import int4_linear

        return int4_linear(x, p["w4"], p["w4_scale"], p.get("b"),
                           x_scale=x_scale, residual=residual,
                           out_dtype=out_dtype, backend=backend,
                           interpret=interpret)
    from tae_tpu.ops.int8 import int8_linear

    return int8_linear(x, p["w_q"], p["w_scale"], p.get("b"),
                       x_scale=x_scale, residual=residual,
                       out_dtype=out_dtype, backend=backend,
                       interpret=interpret)


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": tinit.ones((dim,), dtype), "bias": tinit.zeros((dim,), dtype)}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return layer_norm(x, p["scale"], p["bias"], eps)


# ---------------------------------------------------------------------------
# patch embedding (conv-as-matmul)
# ---------------------------------------------------------------------------

def patch_embed_init(key: jax.Array, patch_size: int, in_chans: int,
                     embed_dim: int, dtype=jnp.float32) -> Params:
    """Patch embedding weight (C·p², E), initialized like the reference's
    conv-viewed-as-linear xavier (reference tae.py:180-181): fan_in = C·p²,
    fan_out = E."""
    k = patch_size * patch_size * in_chans
    return {
        "w": tinit.xavier_uniform(key, (k, embed_dim), dtype),
        "b": tinit.zeros((embed_dim,), dtype),
    }


def patch_embed_apply(p: Params, imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, C, H, W) -> (B, N, E): patch extraction + one MXU matmul.

    For large patches the explicit extract_patches relayout is expressed as
    one einsum instead so XLA folds (most of) the transpose into the matmul
    operand read — measured +1.4-2.5% end-to-end p128 encode, neutral at
    p16/p64; kept above the reference's strided-conv lowering, which
    measured 1.5% slower than v1 (v5e, lax.conv_general_dilated)."""
    if "w" in p and patch_size >= 64:
        b, c, h, w = imgs.shape
        gh, gw = h // patch_size, w // patch_size
        x = imgs.reshape(b, c, gh, patch_size, gw, patch_size)
        wmat = p["w"].reshape(c, patch_size, patch_size, -1)
        y = jnp.einsum("bchpwq,cpqe->bhwe", x, wmat)
        return y.reshape(b, gh * gw, -1) + p["b"]
    x = extract_patches(imgs, patch_size)
    return linear_apply(p, x)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _fused_attn_minn() -> int:
    """Minimum token count for the fused-qkv Pallas attention kernel (the
    measured v5e crossover; env-overridable for on-chip tuning)."""
    return int(os.environ.get("TAE_TPU_ATTN_FUSED_MINN", "128"))


def _attn_wide(n: int, int8_path: bool) -> bool:
    """Measured dispatch for the wide (batch-blocked) packed attention
    kernel below the fused-kernel crossover (v5e): always wins inside the
    int8 block (+18% p64 encode — everything around it is already Pallas,
    so there are no XLA fusions to lose); in bf16 it wins only at N<=4
    (+1.3% p128, but -9% p64 where XLA fuses LN into its attention
    einsums). TAE_TPU_ATTN_WIDE=1/0 forces it on/off."""
    env = os.environ.get("TAE_TPU_ATTN_WIDE", "")
    if env in ("0", "1"):
        return env == "1"
    return int8_path or n <= 4


def attention_init(key: jax.Array, cfg: AttentionConfig, dtype=jnp.float32) -> Params:
    k_qkv, k_proj = jax.random.split(key)
    p: Params = {
        "qkv": linear_init(k_qkv, cfg.dim, cfg.dim * 3, bias=cfg.qkv_bias, dtype=dtype),
        "proj": linear_init(k_proj, cfg.dim, cfg.dim, bias=True, dtype=dtype),
    }
    if cfg.qk_norm:
        head_dim = cfg.dim // cfg.num_heads
        p["q_norm"] = layer_norm_init(head_dim, dtype)
        p["k_norm"] = layer_norm_init(head_dim, dtype)
    return p


def attention_apply(p: Params, x: jnp.ndarray, cfg: AttentionConfig,
                    backend: str | None = None,
                    serving: bool = False) -> jnp.ndarray:
    """``serving=True`` (Tokenizer/encode inference contexts only) selects
    the clamped constant-shift softmax kernels (+2% p16 bf16 encode, r2d).
    The default keeps the exact max-subtract form so f(x) matches the
    primal of value_and_grad(f)(x) for logits outside the clamp window —
    anything that might be differentiated or evaluated for parity must NOT
    set it."""
    from tae_tpu.ops.attention import default_backend

    b, n, c = x.shape
    h = cfg.num_heads
    dh = c // h
    qkv = linear_apply(p["qkv"], x)  # (B, N, 3C)
    resolved = backend or default_backend()
    if backend is None and resolved == "pallas" and n < _fused_attn_minn():
        if _attn_wide(n, int8_path=False) and not cfg.qk_norm:
            from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention_wide

            return linear_apply(p["proj"],
                                fused_qkv_attention_wide(qkv, h,
                                                         serving=serving))
        # measured on v5e: the fused kernel wins at N=256 (+24% end-to-end
        # encode) but XLA's folded-batch einsums win at N<=64 where
        # attention is a negligible FLOP fraction and per-head matmuls are
        # too small for the MXU
        resolved = "xla"
    if resolved == "pallas" and not cfg.qk_norm:
        # fully fused path: head split/merge happens inside the kernel, so
        # no (B, H, N, dh) transposes ever hit HBM (they cost more than the
        # attention math itself at TAE shapes)
        from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention

        y = fused_qkv_attention(qkv, h, serving=serving)
    else:
        qkv = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if cfg.qk_norm:
            q = layer_norm_apply(p["q_norm"], q, cfg.ln_eps)
            k = layer_norm_apply(p["k_norm"], k, cfg.ln_eps)
        y = attention(q, k, v, backend=resolved)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
    return linear_apply(p["proj"], y)


# ---------------------------------------------------------------------------
# mlp
# ---------------------------------------------------------------------------

def mlp_init(key: jax.Array, in_dim: int, hidden_dim: int,
             out_dim: int | None = None, dtype=jnp.float32) -> Params:
    out_dim = out_dim or in_dim
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_dim, hidden_dim, dtype=dtype),
        "fc2": linear_init(k2, hidden_dim, out_dim, dtype=dtype),
    }


def mlp_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    x = linear_apply(p["fc1"], x)
    # GELU: exact erf in fp32 (torch nn.GELU parity); tanh approximation in
    # bf16 compute, where its max error (~3e-3, at |x|~2) is below bf16's
    # own rounding step there (~1.6e-2) — numerically indistinguishable but
    # ~5x cheaper on the VPU. Measured on v5e: the erf lowering (erfc+exp
    # chains) was the single largest cost in every encode config (e.g.
    # 2.6ms vs 0.9ms for a (16384,4096) fc1+gelu).
    approx = x.dtype == jnp.bfloat16
    x = jax.nn.gelu(x, approximate=approx)
    return linear_apply(p["fc2"], x)


# ---------------------------------------------------------------------------
# transformer block + depth-stacked scan
# ---------------------------------------------------------------------------

def block_init(key: jax.Array, cfg: BlockConfig, dtype=jnp.float32) -> Params:
    k_attn, k_mlp = jax.random.split(key)
    return {
        "norm1": layer_norm_init(cfg.dim, dtype),
        "attn": attention_init(k_attn, cfg.attn, dtype),
        "norm2": layer_norm_init(cfg.dim, dtype),
        "mlp": mlp_init(k_mlp, cfg.dim, cfg.mlp_hidden, dtype=dtype),
    }


def block_apply(p: Params, x: jnp.ndarray, cfg: BlockConfig,
                backend: str | None = None,
                serving: bool = False) -> jnp.ndarray:
    """Pre-LN residual block (reference tae.py:128-131)."""
    fc1 = p["mlp"]["fc1"]
    if ("w_q" in fc1 or "w4" in fc1) and not cfg.qk_norm:
        from tae_tpu.ops.attention import default_backend

        if (backend or default_backend()) == "pallas":
            return int8_block_apply(p, x, cfg)
    x = x + attention_apply(p["attn"], layer_norm_apply(p["norm1"], x, cfg.ln_eps),
                            cfg.attn, backend=backend, serving=serving)
    x = x + mlp_apply(p["mlp"], layer_norm_apply(p["norm2"], x, cfg.ln_eps))
    return x


def int8_block_apply(p: Params, x: jnp.ndarray, cfg: BlockConfig,
                     interpret: bool = False, ln_in=None, norm1_next=None,
                     chain: bool = False):
    """Fully fused quantized serving path for one pre-LN block (w8a8 params
    from tae_tpu.ops.int8.quantize_params, or the packed-int4 w4a8 layout of
    tae_tpu.ops.int4 — dispatched per-leaf, mixed trees fine). Every
    elementwise pass rides a fused kernel: LN+quantize (ln_quant), qkv
    matmul with dequant epilogue, proj matmul with fused residual add, and
    the whole MLP+residual in one kernel — no (B, N, 4d) hidden activation
    and no standalone quantize pass ever touches HBM. Attention itself stays
    bf16 (its FLOPs are negligible at TAE shapes, SURVEY.md §3.5)."""
    from tae_tpu.ops.pallas.int8_block import int8_mlp, ln_quant

    b, n, c = x.shape
    h = cfg.num_heads
    dh = c // h
    x2 = x.reshape(b * n, c)
    # --- attention half: x = x + proj(attn(qkv(LN(x)))) ---
    if ln_in is not None:
        # chained from the previous layer's MLP epilogue (the standalone
        # ln_quant read of the residual stream is skipped entirely)
        xq, sx = ln_in
    else:
        xq, sx = ln_quant(x2, p["norm1"]["scale"], p["norm1"]["bias"],
                          cfg.ln_eps, interpret=interpret)
    a = p["attn"]
    import os

    # int8 qkv -> attention chaining at large N: the qkv matmul emits int8
    # + per-(row, n-block) scales and the attention kernel dequantizes in
    # VMEM while stacking heads, deleting the bf16 qkv round-trip (~38% of
    # p16 int8 per-layer bytes). MEASURED AND OFF BY DEFAULT: p16 int8
    # encode 2048 -> 1885 img/s (-8%) — the per-element dequant during the
    # (already VPU-bound) head stacking costs more than the saved DMA,
    # the same VPU-vs-bytes verdict as the int4 path (docs/KERNELS.md).
    # TAE_TPU_QKV_Q8=1 enables for shape regimes where bytes dominate.
    # the i8 attention kernel needs dh to divide the q8_out scale block
    # bn = _block(3c, 512) (e.g. dh=256 with 3c=768 gives bn=384 — the old
    # `512 % dh` proxy wrongly passed that); mirror int8_linear's blocking
    from tae_tpu.ops.int8 import _block as _i8_block

    use_i8_qkv = (not interpret and n >= _fused_attn_minn()
                  and "w_q" in a["qkv"] and not cfg.qk_norm
                  and _i8_block(3 * c, 512) % dh == 0
                  and os.environ.get("TAE_TPU_QKV_Q8") == "1")
    if use_i8_qkv:
        from tae_tpu.ops.int8 import int8_linear
        from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention_i8

        qkv_q, qkv_s = int8_linear(xq, a["qkv"]["w_q"], a["qkv"]["w_scale"],
                                   a["qkv"].get("b"), x_scale=sx,
                                   q8_out=True, interpret=interpret)
        y = fused_qkv_attention_i8(qkv_q.reshape(b, n, 3 * c), qkv_s, h)
        x2 = _qlinear(a["proj"], y.reshape(b * n, c),
                      backend="pallas" if not interpret else None,
                      residual=x2, out_dtype=x.dtype, interpret=interpret)
        out, ln_next = _int8_mlp_half(p, x2, cfg, interpret,
                                      norm1_next=norm1_next)
        out = out.reshape(b, n, c)
        return (out, ln_next) if chain else out
    qkv = _qlinear(a["qkv"], xq, x_scale=sx, out_dtype=x.dtype,
                   interpret=interpret)
    # attention emits int8 + per-row scales directly (the proj matmul's
    # input quantization rides the kernel that already holds the output in
    # VMEM — the XLA convert+quantize passes it replaces profiled ~10% of
    # p16 int8 encode)
    import os

    # int8-output attention pays an amax+quantize epilogue to delete the
    # XLA convert+quantize passes before proj. Measured: wins at tiny N
    # (p64 4991->5117, p128 ~+2%) where the wide kernel's f32 scratch is
    # small, and — since the 32M vmem limit stopped the q8 scratch from
    # costing p32 its MLP blocking — at N=64 too (p32 2623 -> 2646, K=48
    # stabilized timing; under the 16M limit it lost 8% there). At N>=128
    # it has flipped with every blocking generation (r2 blocking: -2%; r3
    # 14M planned blocking: +2%; r3 32M-limit blocking: p16 2510 -> 2609
    # WITHOUT it) — under the bigger proj tiles the in-kernel quantize is
    # free while the per-batch attention kernel's quantize epilogue is
    # not, so large N stays bf16-out. TAE_TPU_PACKED_ATTN_Q8=0/1 forces.
    env_q8 = os.environ.get("TAE_TPU_PACKED_ATTN_Q8", "")
    use_q8 = env_q8 != "0" if env_q8 else n <= 64
    if not interpret and n >= _fused_attn_minn():
        # same measured dispatch rule as attention_apply
        from tae_tpu.ops.pallas.flash_attention import (fused_qkv_attention,
                                                        fused_qkv_attention_q8)

        if use_q8:
            yq, sy = fused_qkv_attention_q8(qkv.reshape(b, n, 3 * c), h)
            y, y_scale = yq.reshape(b * n, c), sy.reshape(b * n, 1)
        else:
            y = fused_qkv_attention(qkv.reshape(b, n, 3 * c), h)
            y, y_scale = y.reshape(b * n, c), None
    elif not interpret and _attn_wide(n, int8_path=True):
        from tae_tpu.ops.pallas.flash_attention import (
            fused_qkv_attention_wide, fused_qkv_attention_wide_q8,
            fused_qkv_attention_wide_q8_2d)

        # 2D (flat) kernel entry: consumes the (B*N, 3C) rows the qkv
        # matmul emits and produces the (B*N, C) int8 + per-row scales the
        # proj matmul consumes. The 3D entry forces an HBM retile on both
        # sides when n < 8 (sublane padding): the r5 profile showed those
        # two reshapes costing 8.4% of the p128 int8 encode iteration, and
        # the 2D entry measured p128 14834 -> 16551 img/s (+11.6%, K=48
        # median-of-5 bands disjoint). At n >= 8 the rows are tile-aligned
        # and XLA's reshape is ~free while the in-kernel view costs a
        # little: p64 (n=16) measured -0.8% — so 2D dispatches only below
        # the sublane tile. TAE_TPU_ATTN_WIDE_2D=1/0 forces on/off.
        env_2d = os.environ.get("TAE_TPU_ATTN_WIDE_2D", "")
        use_2d = env_2d != "0" if env_2d else n < 8
        if use_q8 and use_2d:
            y, y_scale = fused_qkv_attention_wide_q8_2d(qkv, n, h)
        elif use_q8:
            yq, sy = fused_qkv_attention_wide_q8(qkv.reshape(b, n, 3 * c), h)
            y, y_scale = yq.reshape(b * n, c), sy.reshape(b * n, 1)
        else:
            y = fused_qkv_attention_wide(qkv.reshape(b, n, 3 * c), h)
            y, y_scale = y.reshape(b * n, c), None
    else:
        r = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        y = attention(r[0], r[1], r[2], backend="xla")
        y = y.transpose(0, 2, 1, 3).reshape(b * n, c)
        y_scale = None
    ln2 = None
    if "w_q" in a["proj"]:
        # LN-chained proj epilogue: norm2 + quantize ride the matmul that
        # already holds the full residual row in VMEM (falls back to the
        # standalone ln_quant when the full-row block doesn't fit)
        from tae_tpu.ops.int8 import int8_linear

        x2, xq2, sx2 = int8_linear(
            y, a["proj"]["w_q"], a["proj"]["w_scale"], a["proj"].get("b"),
            x_scale=y_scale, residual=x2, out_dtype=x.dtype,
            backend="pallas", interpret=interpret,
            ln_out=(p["norm2"]["scale"], p["norm2"]["bias"], cfg.ln_eps))
        if xq2 is not None:
            ln2 = (xq2, sx2)
    else:
        x2 = _qlinear(a["proj"], y, x_scale=y_scale,
                      backend="pallas" if not interpret else None,
                      residual=x2, out_dtype=x.dtype, interpret=interpret)
    out, ln_next = _int8_mlp_half(p, x2, cfg, interpret, ln2=ln2,
                                  norm1_next=norm1_next)
    out = out.reshape(b, n, c)
    return (out, ln_next) if chain else out


def _int8_mlp_half(p: Params, x2: jnp.ndarray, cfg: BlockConfig,
                   interpret: bool, ln2=None, norm1_next=None):
    """x = x + fc2(gelu(fc1(LN(x)))), one fused kernel (int8 or int4).

    ``ln2``: (xq, sx) of LN(norm2, x2) when the proj epilogue already
    produced it. ``norm1_next``: the NEXT layer's norm1 affine — chained
    into the MLP epilogue when it fits. Returns (y, ln_next_or_None)."""
    from tae_tpu.ops.pallas.int8_block import int8_mlp, ln_quant

    if ln2 is not None:
        xq2, sx2 = ln2
    else:
        xq2, sx2 = ln_quant(x2, p["norm2"]["scale"], p["norm2"]["bias"],
                            cfg.ln_eps, interpret=interpret)
    f1, f2 = p["mlp"]["fc1"], p["mlp"]["fc2"]
    if "w4" in f1:
        from tae_tpu.ops.pallas.int4_block import int4_mlp

        return int4_mlp(xq2, sx2, f1["w4"], f1["w4_scale"], f1["b"],
                        f2["w4"], f2["w4_scale"], f2["b"], residual=x2,
                        out_dtype=x2.dtype, interpret=interpret), None
    import os

    ln_next_arg = None
    if norm1_next is not None and os.environ.get("TAE_TPU_LN_CHAIN") != "0":
        ln_next_arg = (norm1_next["scale"], norm1_next["bias"], cfg.ln_eps)
    if ln_next_arg is not None:
        y, nq, ns = int8_mlp(xq2, sx2, f1["w_q"], f1["w_scale"], f1["b"],
                             f2["w_q"], f2["w_scale"], f2["b"], residual=x2,
                             out_dtype=x2.dtype, interpret=interpret,
                             ln_next=ln_next_arg)
        return y, ((nq, ns) if nq is not None else None)
    return int8_mlp(xq2, sx2, f1["w_q"], f1["w_scale"], f1["b"],
                    f2["w_q"], f2["w_scale"], f2["b"], residual=x2,
                    out_dtype=x2.dtype, interpret=interpret), None


def blocks_init(key: jax.Array, cfg: BlockConfig, depth: int,
                dtype=jnp.float32) -> Params:
    """Depth-stacked block parameters: every leaf gains a leading (depth,) axis."""
    keys = jax.random.split(key, depth)
    return jax.vmap(lambda k: block_init(k, cfg, dtype))(keys)


def blocks_apply(stacked: Params, x: jnp.ndarray, cfg: BlockConfig,
                 backend: str | None = None, remat: bool | str = False,
                 unroll: bool | int = False, final_norm: Params | None = None,
                 serving: bool = False):
    """Apply a depth-stacked block stack with ``lax.scan``.

    ``stacked`` may instead be a list of per-layer param trees (the serving
    layout produced by ``tae_tpu.ops.int8.unstack_blocks``):
    then the loop is plain Python and each layer's weights are root buffers
    — no per-layer dynamic-slice copies of the stacked arrays, which
    profiled at ~8% of int8 encode (Pallas operands cannot alias a slice).

    ``remat=True`` wraps each layer in ``jax.checkpoint`` so the backward pass
    rematerializes activations instead of storing depth × (B, N, 4d) — the
    TPU-idiomatic HBM/FLOPs trade for the 2.5B+ configs. ``remat="dots"``
    uses the selective ``checkpoint_dots`` policy instead: matmul outputs are
    saved and only elementwise work (LN, GELU, softmax) recomputes — less
    backward recompute at a higher HBM high-water mark.

    ``unroll=True`` fully unrolls the layer loop (static weight slices, depth×
    compile time). Measured neutral-to-slightly-negative on v5e encode — the
    per-layer weight relayout copies persist either way — so it stays off by
    default. An int unrolls the scan body that many layers per loop
    iteration (``lax.scan``'s partial unroll): amortizes the per-iteration
    weight-slice / stacked-grad dynamic-update-slice bookkeeping (profiled
    ~6% of the p16 train step) without the full unroll's HBM blow-up
    (fully-unrolled train backward measured 17.1G > 15.75G HBM).
    """
    if isinstance(stacked, (list, tuple)):
        from tae_tpu.ops.attention import default_backend

        pallas = (backend or default_backend()) == "pallas"
        ln = None
        for i, layer in enumerate(stacked):
            fc1 = layer.get("mlp", {}).get("fc1", {}) \
                if isinstance(layer, dict) else {}
            if not (pallas and "w_q" in fc1 and not cfg.qk_norm):
                x = block_apply(layer, x, cfg, backend=backend,
                                serving=serving)
                ln = None
                continue
            nxt = stacked[i + 1] if i + 1 < len(stacked) else None
            nfc1 = nxt.get("mlp", {}).get("fc1", {}) \
                if isinstance(nxt, dict) else {}
            if "w_q" in nfc1:
                norm1_next = nxt["norm1"]
            elif nxt is None and final_norm is not None:
                # chain the FINAL LayerNorm + head-input quantize into the
                # last block's MLP epilogue (the final LN+head pass was on
                # the r2 list of non-matmul encode-tail suspects)
                norm1_next = final_norm
            else:
                norm1_next = None
            x, ln = int8_block_apply(layer, x, cfg, ln_in=ln,
                                     norm1_next=norm1_next, chain=True)
        return (x, ln) if final_norm is not None else x
    fn = lambda carry, layer: (block_apply(layer, carry, cfg, backend=backend,
                                           serving=serving), None)
    if remat:
        policies = {
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }
        policy = policies[remat] if isinstance(remat, str) else None
        fn = jax.checkpoint(fn, prevent_cse=False, policy=policy)
    depth = jax.tree.leaves(stacked)[0].shape[0]
    u = depth if unroll is True else (int(unroll) or 1)
    y, _ = jax.lax.scan(fn, x, stacked, unroll=u)
    return (y, None) if final_norm is not None else y
