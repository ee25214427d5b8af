"""Op-level golden tests: patchify round-trips, layernorm numerics,
Pallas kernels (interpret mode) vs their XLA references, quantizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tae_tpu.ops.attention import attention, attention_xla
from tae_tpu.ops.layernorm import layer_norm
from tae_tpu.ops.pallas.flash_attention import flash_attention
from tae_tpu.ops.patchify import extract_patches, patchify, unpatchify
from tae_tpu.ops.quantizer import nearest_code, vq_ste


def test_patchify_unpatchify_roundtrip():
    imgs = jax.random.normal(jax.random.key(0), (2, 3, 64, 64))
    x = patchify(imgs, 16)
    assert x.shape == (2, 16, 16 * 16 * 3)
    assert jnp.allclose(unpatchify(x, 16), imgs)


def test_patchify_ordering_matches_reference_einsum():
    """patchify must be bit-for-bit the reference's nchpwq->nhwpqc
    (reference tae.py:196-208)."""
    imgs = np.arange(2 * 3 * 8 * 8, dtype=np.float32).reshape(2, 3, 8, 8)
    p = 4
    h = w = 2
    ref = imgs.reshape(2, 3, h, p, w, p)
    ref = np.einsum("nchpwq->nhwpqc", ref).reshape(2, h * w, p * p * 3)
    np.testing.assert_array_equal(np.asarray(patchify(jnp.asarray(imgs), p)), ref)


def test_extract_patches_matches_conv_weight_layout():
    """extract_patches is channel-major so a torch conv weight (E, C, p, p)
    reshaped to (E, C·p²) applies directly (transposed)."""
    imgs = np.arange(1 * 3 * 8 * 8, dtype=np.float32).reshape(1, 3, 8, 8)
    p = 4
    got = np.asarray(extract_patches(jnp.asarray(imgs), p))
    # patch (0, 0): imgs[:, :, :4, :4] flattened channel-major
    expect = imgs[0, :, :4, :4].reshape(-1)
    np.testing.assert_array_equal(got[0, 0], expect)


def test_layer_norm_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((4, 7, 33)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal(33).astype(np.float32)
    b = np.random.default_rng(2).standard_normal(33).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-6))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (33,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n,dh", [(256, 64), (64, 64), (16, 80), (4, 80)])
def test_flash_attention_matches_xla(n, dh):
    """Pallas kernel (interpret mode on CPU) vs the jnp reference, across the
    TAE shape grid including the tiny-N p128 case."""
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (2, 3, n, dh), jnp.float32)
    k = jax.random.normal(k2, (2, 3, n, dh), jnp.float32)
    v = jax.random.normal(k3, (2, 3, n, dh), jnp.float32)
    ref = attention_xla(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_attention_grad_matches_xla():
    k1, k2, k3, k4 = jax.random.split(jax.random.key(1), 4)
    shape = (1, 2, 16, 64)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in (k1, k2, k3))
    ct = jax.random.normal(k4, shape, jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) * ct)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)


def test_attention_dispatch_unknown_backend():
    q = jnp.zeros((1, 1, 4, 8))
    with pytest.raises(ValueError, match="unknown attention backend"):
        attention(q, q, q, backend="cuda")


def test_nearest_code_exact():
    cb = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, 0.5]])
    z = jnp.asarray([[[0.1, -0.1], [0.9, 1.2], [-0.8, 0.4]]])
    idx = nearest_code(z, cb)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 1, 2]])


def test_vq_ste_gradient_is_identity_to_encoder():
    cb = jax.random.normal(jax.random.key(0), (8, 4))
    z = jax.random.normal(jax.random.key(1), (2, 3, 4))

    def f(z):
        zq, _ = vq_ste(z, cb)
        return jnp.sum(zq * 2.0)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)


@pytest.mark.parametrize("m,k,v,bm,bk", [(32, 64, 16, 8, 16), (100, 130, 32, 32, 64),
                                         (16, 8192, 256, 16, 512)])
def test_nearest_code_pallas_matches_xla(m, k, v, bm, bk):
    from tae_tpu.ops.pallas.quantizer import nearest_code_pallas
    from tae_tpu.ops.quantizer import nearest_code_xla

    kz, kc = jax.random.split(jax.random.key(3))
    z = jax.random.normal(kz, (m, v), jnp.float32)
    cb = jax.random.normal(kc, (k, v), jnp.float32)
    ref = nearest_code_xla(z, cb)
    got = nearest_code_pallas(z, cb, block_m=bm, block_k=bk, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("n,h,dh", [(256, 16, 64), (16, 32, 80), (4, 32, 80)])
def test_fused_qkv_attention_matches_split_path(n, h, dh):
    from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention

    c = h * dh
    qkv = jax.random.normal(jax.random.key(5), (2, n, 3 * c), jnp.float32)
    got = fused_qkv_attention(qkv, h, interpret=True)
    # reference: split -> attention_xla -> merge
    r = qkv.reshape(2, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
    ref = attention_xla(r[0], r[1], r[2]).transpose(0, 2, 1, 3).reshape(2, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_qkv_attention_grad():
    from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention

    n, h, dh = 16, 4, 64
    c = h * dh
    qkv = jax.random.normal(jax.random.key(6), (1, n, 3 * c), jnp.float32)
    ct = jax.random.normal(jax.random.key(7), (1, n, c), jnp.float32)

    def loss_fused(qkv):
        return jnp.sum(fused_qkv_attention(qkv, h, None, True) * ct)

    def loss_ref(qkv):
        r = qkv.reshape(1, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        y = attention_xla(r[0], r[1], r[2]).transpose(0, 2, 1, 3).reshape(1, n, c)
        return jnp.sum(y * ct)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("m,k,v_out", [(256, 512, 512), (8, 1024, 16), (300, 512, 1024)])
def test_int8_matmul_fused_matches_xla_path(m, k, v_out):
    from tae_tpu.ops.int8 import int8_linear_xla, quantize_weight
    from tae_tpu.ops.pallas.int8_matmul import int8_matmul_fused

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, v_out)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(v_out).astype(np.float32))
    wq, sw = quantize_weight(w)
    ref = int8_linear_xla(x, wq, sw, b)

    pad = (-m) % (256 if m >= 256 else 8)
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    got = int8_matmul_fused(xp, wq, sw, b, block_m=min(256, xp.shape[0]),
                            block_n=min(512, v_out), block_k=min(512, k),
                            interpret=True)[:m]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_int8_linear_wrapper_arbitrary_leading_dims():
    from tae_tpu.ops.int8 import int8_linear, quantize_weight

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    wq, sw = quantize_weight(w)
    y = int8_linear(x, wq, sw)  # xla fallback on CPU tests
    assert y.shape == (2, 5, 48)
    rel = float(jnp.mean(jnp.abs(y - x @ w)) / jnp.mean(jnp.abs(x @ w)))
    assert rel < 0.03


@pytest.mark.parametrize("shape", [(4, 7, 256), (100, 1024), (2, 3, 5, 128)])
def test_fused_layer_norm_matches_xla(shape):
    from tae_tpu.ops.layernorm import layer_norm_xla
    from tae_tpu.ops.pallas.layernorm import fused_layer_norm

    d = shape[-1]
    k1, k2, k3 = jax.random.split(jax.random.key(9), 3)
    x = jax.random.normal(k1, shape, jnp.float32) * 3 + 1
    w = jax.random.normal(k2, (d,), jnp.float32)
    b = jax.random.normal(k3, (d,), jnp.float32)
    ref = layer_norm_xla(x, w, b, 1e-6)
    got = fused_layer_norm(x, w, b, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_layer_norm_grad_matches_xla():
    from tae_tpu.ops.layernorm import layer_norm_xla
    from tae_tpu.ops.pallas.layernorm import fused_layer_norm

    d = 256
    k1, k2, k3, k4 = jax.random.split(jax.random.key(10), 4)
    x = jax.random.normal(k1, (37, d), jnp.float32)  # odd rows -> padding path
    w = jax.random.normal(k2, (d,), jnp.float32)
    b = jax.random.normal(k3, (d,), jnp.float32)
    ct = jax.random.normal(k4, (37, d), jnp.float32)

    g_ref = jax.grad(lambda x, w, b: jnp.sum(layer_norm_xla(x, w, b, 1e-6) * ct),
                     argnums=(0, 1, 2))(x, w, b)
    g_pal = jax.grad(lambda x, w, b: jnp.sum(fused_layer_norm(x, w, b, 1e-6, True) * ct),
                     argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=3e-5, rtol=3e-5)


def test_bf16_gelu_approx_within_bf16_rounding():
    """The tanh-approx GELU used under the bf16 policy must agree with the
    exact-erf GELU to within bf16 quantization of the exact result."""
    x = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    approx_bf16 = jax.nn.gelu(x.astype(jnp.bfloat16), approximate=True)
    exact_bf16 = exact.astype(jnp.bfloat16).astype(jnp.float32)
    diff = np.abs(np.asarray(approx_bf16, np.float32) - exact_bf16)
    # 2 bf16 ulps (7 mantissa bits; one from the bf16 input rounding
    # propagated through gelu' <= 1.13, one from output rounding) plus the
    # approximation's 3e-3 analytic bound
    step = np.maximum(np.abs(exact_bf16) * 2 ** -6, 2 ** -9)
    assert (diff <= step + 3.2e-3).all()


# ---------------------------------------------------------------------------
# fused int8 block kernels (ops/pallas/int8_block.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,d", [(64, 128), (40, 256), (130, 384)])
def test_ln_quant_matches_reference(m, d):
    from tae_tpu.ops.layernorm import layer_norm_xla
    from tae_tpu.ops.pallas.int8_block import ln_quant

    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    x = jax.random.normal(k1, (m, d), jnp.float32) * 2 + 0.5
    w = jax.random.normal(k2, (d,), jnp.float32)
    b = jax.random.normal(k3, (d,), jnp.float32)
    xq, sx = ln_quant(x, w, b, 1e-6, interpret=True)
    assert xq.shape == (m, d) and xq.dtype == jnp.int8
    assert sx.shape == (m, 1)
    y = np.asarray(layer_norm_xla(x, w, b, 1e-6))
    s_ref = np.maximum(np.abs(y).max(axis=1, keepdims=True) / 127.0, 1e-12)
    np.testing.assert_allclose(np.asarray(sx), s_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xq, np.float32) * np.asarray(sx),
                               y, atol=s_ref.max() * 0.51)


@pytest.mark.parametrize("m,d,hdim,bh", [(64, 128, 512, 128), (40, 256, 1024, 512)])
def test_int8_mlp_matches_blockwise_emulation(m, d, hdim, bh):
    """Kernel vs an exact numpy/jnp emulation of the same blockwise int8
    algorithm (int32 dots, per-(row, block) hidden scales, fp32 accum)."""
    from tae_tpu.ops.int8 import quantize_weight
    from tae_tpu.ops.pallas.int8_block import int8_mlp, ln_quant

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, hdim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(hdim).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hdim, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    ln_w = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    xq, sx = ln_quant(x, ln_w, ln_b, 1e-6, interpret=True)

    got = int8_mlp(xq, sx, w1q, s1, b1, w2q, s2, b2, res,
                   block_m=32, block_h=bh, out_dtype=jnp.float32,
                   interpret=True)

    # exact emulation of the kernel's algorithm
    xq_n = np.asarray(xq, np.int64)
    acc = np.zeros((m, d), np.float32)
    for j in range(hdim // bh):
        sl = slice(j * bh, (j + 1) * bh)
        ig = (xq_n @ np.asarray(w1q, np.int64)[:, sl]).astype(np.float32)
        h = ig * np.asarray(sx) * np.asarray(s1)[sl] + np.asarray(b1)[sl]
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=True))
        sh = np.maximum(np.abs(h).max(axis=1, keepdims=True) / 127.0, 1e-12)
        hq = np.clip(np.round(h / sh), -127, 127).astype(np.int64)
        acc += (hq @ np.asarray(w2q, np.int64)[sl]).astype(np.float32) * sh
    ref = acc * np.asarray(s2) + np.asarray(b2) + np.asarray(res)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-3)

    # and the whole thing approximates the float MLP to int8 tolerance
    y_ln = np.asarray(x)  # ln with identity affine on ~unit-scale input
    y_ln = (y_ln - y_ln.mean(1, keepdims=True)) / np.sqrt(
        y_ln.var(1, keepdims=True) + 1e-6)
    h_f = np.asarray(jax.nn.gelu(jnp.asarray(y_ln @ np.asarray(w1) + np.asarray(b1)),
                                 approximate=True))
    ref_f = h_f @ np.asarray(w2) + np.asarray(b2) + np.asarray(res)
    rel = np.abs(np.asarray(got) - ref_f).mean() / np.abs(ref_f).mean()
    assert rel < 0.02, rel


def test_int8_matmul_fused_prequantized_input_and_residual():
    from tae_tpu.ops.int8 import quantize_weight
    from tae_tpu.ops.pallas.int8_block import ln_quant
    from tae_tpu.ops.pallas.int8_matmul import int8_matmul_fused

    rng = np.random.default_rng(3)
    m, k, n = 64, 256, 128
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    wq, sw = quantize_weight(w)
    xq, sx = ln_quant(x, jnp.ones((k,)), jnp.zeros((k,)), 1e-6, interpret=True)

    got = int8_matmul_fused(xq, wq, sw, b, block_m=32, block_n=128,
                            block_k=128, out_dtype=jnp.float32, x_scale=sx,
                            residual=res, interpret=True)
    ref = (np.asarray(xq, np.int64) @ np.asarray(wq, np.int64)).astype(np.float32)
    ref = ref * np.asarray(sx) * np.asarray(sw) + np.asarray(b) + np.asarray(res)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


def test_int8_block_apply_matches_float_block():
    """The fully fused int8 block path (interpret mode) approximates the
    float block to int8-serving tolerance."""
    from tae_tpu.nn.vit import (BlockConfig, block_apply, block_init,
                                int8_block_apply)
    from tae_tpu.ops.int8 import quantize_params

    cfg = BlockConfig(dim=128, num_heads=4)
    p = block_init(jax.random.key(12), cfg)
    pq = quantize_params(p)
    x = jax.random.normal(jax.random.key(13), (2, 16, 128), jnp.float32)
    ref = block_apply(p, x, cfg, backend="xla")
    got = int8_block_apply(pq, x, cfg, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.03, rel


@pytest.mark.parametrize("b,n,h,dh,bb", [(8, 16, 32, 80, 4), (16, 4, 32, 80, 16),
                                         (6, 16, 4, 64, 4)])
def test_fused_qkv_attention_wide_matches_xla(b, n, h, dh, bb):
    """Batch-blocked packed attention (tiny-N serving path) vs the split
    reference; bb not dividing b exercises the divisor fallback."""
    from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention_wide

    c = h * dh
    qkv = jax.random.normal(jax.random.key(21), (b, n, 3 * c), jnp.float32)
    got = fused_qkv_attention_wide(qkv, h, block_b=bb, interpret=True)
    r = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
    ref = attention_xla(r[0], r[1], r[2]).transpose(0, 2, 1, 3).reshape(b, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("wide,b,n,h,dh", [(False, 3, 128, 8, 64),
                                           (True, 8, 16, 32, 80),
                                           (True, 16, 4, 32, 80)])
def test_fused_qkv_attention_q8_matches_float(wide, b, n, h, dh):
    """int8-output attention (serving): dequantized output matches the
    float kernel within per-row int8 quantization error."""
    from tae_tpu.ops.pallas.flash_attention import (fused_qkv_attention_q8,
                                                    fused_qkv_attention_wide_q8)

    c = h * dh
    qkv = jax.random.normal(jax.random.key(31), (b, n, 3 * c), jnp.float32)
    fn = fused_qkv_attention_wide_q8 if wide else fused_qkv_attention_q8
    oq, sc = fn(qkv, h, interpret=True)
    assert oq.dtype == jnp.int8 and sc.shape == (b, n, 1)
    got = oq.astype(jnp.float32) * sc
    r = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
    ref = attention_xla(r[0], r[1], r[2]).transpose(0, 2, 1, 3).reshape(b, n, c)
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.02, rel  # per-row symmetric int8 rounding error


def test_fused_qkv_attention_wide_grad_matches_reference():
    from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention_wide

    b, n, h, dh = 4, 8, 4, 64
    c = h * dh
    qkv = jax.random.normal(jax.random.key(22), (b, n, 3 * c), jnp.float32)
    ct = jax.random.normal(jax.random.key(23), (b, n, c), jnp.float32)

    def loss_wide(qkv):
        return jnp.sum(fused_qkv_attention_wide(qkv, h, None, 2, True) * ct)

    def loss_ref(qkv):
        r = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        y = attention_xla(r[0], r[1], r[2]).transpose(0, 2, 1, 3).reshape(b, n, c)
        return jnp.sum(y * ct)

    g1 = jax.grad(loss_wide)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-5, rtol=5e-5)


# ---------------------------------------------------------------------------
# int4 (w4a8, packed nibble planes + group scales)
# ---------------------------------------------------------------------------

def test_int4_pack_unpack_roundtrip():
    """Packed nibble planes decode back to the exact quantized values, and
    dequantization error is bounded by half a group step."""
    from tae_tpu.ops.int4 import (dequantize_int4, quantize_weight_int4,
                                  unpack_int4)

    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    w4, s = quantize_weight_int4(w, group=128)
    assert w4.shape == (256, 128) and w4.dtype == jnp.int8
    assert s.shape == (4, 128) and s.dtype == jnp.float32
    lo, hi = unpack_int4(w4)
    assert int(jnp.min(lo)) >= -7 and int(jnp.max(lo)) <= 7
    assert int(jnp.min(hi)) >= -7 and int(jnp.max(hi)) <= 7
    # reconstruct q from planes and check the offset-8 packing law
    # byte-for-byte: byte = 16·hi + (lo + 8)  (tae_tpu/ops/int4.py)
    q = np.concatenate([np.asarray(lo), np.asarray(hi)], 0).astype(np.int32)
    byte = q[256:] * 16 + (q[:256] + 8)
    np.testing.assert_array_equal(byte.astype(np.int8), np.asarray(w4))
    # dequant error <= step/2 per group
    wd = np.asarray(dequantize_int4(w4, s))
    step = np.repeat(np.asarray(s), 128, axis=0)
    assert np.all(np.abs(wd - np.asarray(w)) <= step * 0.5 + 1e-6)


def test_int4_matmul_fused_matches_reference():
    from tae_tpu.ops.int4 import int4_linear_xla, quantize_weight_int4
    from tae_tpu.ops.pallas.int4_matmul import int4_matmul_fused

    rng = np.random.default_rng(8)
    m, k, n = 48, 512, 256
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    w4, s = quantize_weight_int4(w, group=128)
    got = int4_matmul_fused(x, w4, s, b, block_m=16, block_n=128,
                            out_dtype=jnp.float32, residual=res,
                            interpret=True)
    ref = np.asarray(int4_linear_xla(x, w4, s, b),
                     np.float32) + np.asarray(res)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


def test_int4_linear_wrapper_and_xla_fallback():
    from tae_tpu.ops.int4 import int4_linear, int4_linear_xla, quantize_weight_int4

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, 5, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    w4, s = quantize_weight_int4(w)
    y_xla = int4_linear(x, w4, s, backend="xla")          # arbitrary leading dims
    y_pallas = int4_linear(x, w4, s, interpret=True)
    assert y_xla.shape == (3, 5, 128)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_pallas),
                               atol=2e-3, rtol=2e-3)
    # the dequantized matmul stays within group-quantization error of fp
    ref = np.asarray(x) @ np.asarray(w)
    rel = np.abs(np.asarray(y_xla) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.2, rel


@pytest.mark.parametrize("m,d,hdim,bh", [(40, 256, 1024, 256), (32, 512, 2048, 512)])
def test_int4_mlp_matches_blockwise_emulation(m, d, hdim, bh):
    """Kernel vs an exact emulation of the same algorithm (group-scaled
    int dots, per-(row, hidden-block) requantization, fp32 accumulation)."""
    from tae_tpu.ops.int4 import dequantize_int4, quantize_weight_int4
    from tae_tpu.ops.pallas.int4_block import int4_mlp
    from tae_tpu.ops.pallas.int8_block import ln_quant

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((d, hdim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(hdim).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hdim, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(d).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    w1_4, s1 = quantize_weight_int4(w1, group=128)
    w2_4, s2 = quantize_weight_int4(w2, group=256)
    xq, sx = ln_quant(x, jnp.ones((d,)), jnp.zeros((d,)), 1e-6, interpret=True)

    got = int4_mlp(xq, sx, w1_4, s1, b1, w2_4, s2, b2, res,
                   block_m=8, block_h=bh, out_dtype=jnp.float32,
                   interpret=True)

    # exact emulation: same group-dot order and fp32 rounding as the kernel
    # (a plain dequantized-matmul reference differs by f32 summation order,
    # which can flip a requantization round() at a .5 tie — one observed
    # row in 32 at 512x2048)
    from tae_tpu.ops.int4 import unpack_int4
    lo1, hi1 = (np.asarray(t, np.float32) for t in unpack_int4(w1_4))
    lo2, hi2 = (np.asarray(t, np.float32) for t in unpack_int4(w2_4))
    xq_f = np.asarray(xq, np.float32)
    g1 = d // s1.shape[0]
    n_g1 = s1.shape[0] // 2
    g2 = hdim // s2.shape[0]
    acc = np.zeros((m, d), np.float32)
    for j in range(hdim // bh):
        cols = slice(j * bh, (j + 1) * bh)
        h = np.zeros((m, bh), np.float32)
        for gi in range(n_g1):
            r = slice(gi * g1, (gi + 1) * g1)
            h += (xq_f[:, r] @ lo1[r, cols]) * np.asarray(s1)[gi, cols]
            r2 = slice(d // 2 + gi * g1, d // 2 + (gi + 1) * g1)
            h += (xq_f[:, r2] @ hi1[(slice(gi * g1, (gi + 1) * g1)), cols]) \
                * np.asarray(s1)[n_g1 + gi, cols]
        h = h * np.asarray(sx) + np.asarray(b1)[cols]
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=True))
        sh = np.maximum(np.abs(h).max(axis=1, keepdims=True) / 127.0, 1e-12)
        # the kernel rounds h · (1/sh) — reciprocal-then-multiply, two f32
        # roundings — not h / sh; replicate or .5-ties flip by one step
        hq = np.clip(np.round(h * (np.float32(1.0) / sh)), -127,
                     127).astype(np.float32)
        w2planes = np.concatenate([lo2, hi2], 0)
        part = np.zeros((m, d), np.float32)
        for gi in range(bh // g2):
            r = slice(j * bh + gi * g2, j * bh + (gi + 1) * g2)
            part += (hq[:, gi * g2:(gi + 1) * g2] @ w2planes[r]) \
                * np.asarray(s2)[(j * bh) // g2 + gi]
        acc += part * sh
    ref = acc + np.asarray(b2) + np.asarray(res)
    # XLA fuses h·sx+b1 into an FMA (one rounding) where numpy rounds twice,
    # so a row whose amax element lands on that ulp gets a slightly different
    # requant scale — bounded by one hq step. Demand near-exactness for the
    # bulk and the one-step bound for those rows.
    diff = np.abs(np.asarray(got) - ref)
    tol = 3e-3 + 3e-3 * np.abs(ref)
    assert (diff > tol).mean() < 0.01, (diff > tol).mean()
    assert diff.max() < 5e-2, diff.max()


def test_int4_block_apply_matches_float_block():
    """The fused quantized block path with int4 MLP/attention weights
    approximates the float block to int4-serving tolerance."""
    from tae_tpu.nn.vit import (BlockConfig, block_apply, block_init,
                                int8_block_apply)
    from tae_tpu.ops.int4 import quantize_params_int4

    cfg = BlockConfig(dim=256, num_heads=4)
    p = block_init(jax.random.key(14), cfg)
    pq = quantize_params_int4({"blocks": p})["blocks"]
    assert "w4" in pq["mlp"]["fc1"] and "w4" in pq["attn"]["qkv"]
    x = jax.random.normal(jax.random.key(15), (2, 16, 256), jnp.float32)
    ref = block_apply(p, x, cfg, backend="xla")
    got = int8_block_apply(pq, x, cfg, interpret=True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.15, rel


def test_int8_matmul_q8_out_roundtrip():
    """q8_out epilogue: dequantized (int8, per-(row, n-block) scales) output
    matches the float output within one quantization step per block."""
    from tae_tpu.ops.int8 import quantize_weight
    from tae_tpu.ops.pallas.int8_matmul import int8_matmul_fused

    rng = np.random.default_rng(20)
    m, k, n, bn = 32, 256, 384, 128
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1)
    wq, sw = quantize_weight(w)
    ref = np.asarray(int8_matmul_fused(x, wq, sw, b, block_m=16, block_n=bn,
                                       block_k=128, out_dtype=jnp.float32,
                                       interpret=True))
    yq, ys = int8_matmul_fused(x, wq, sw, b, block_m=16, block_n=bn,
                               block_k=128, q8_out=True, interpret=True)
    assert yq.dtype == jnp.int8 and ys.shape == (n // bn, m, 1)
    deq = np.zeros((m, n), np.float32)
    for j in range(n // bn):
        deq[:, j * bn:(j + 1) * bn] = (np.asarray(yq[:, j * bn:(j + 1) * bn],
                                                  np.float32)
                                       * np.asarray(ys)[j])
    step = np.asarray(ys).max()
    np.testing.assert_allclose(deq, ref, atol=step * 0.51 + 1e-6)


def test_fused_qkv_attention_i8_matches_float():
    """int8-input attention (dequant during head stacking) matches the
    float path within the input quantization error."""
    from tae_tpu.ops.attention import attention_xla
    from tae_tpu.ops.pallas.flash_attention import fused_qkv_attention_i8

    rng = np.random.default_rng(21)
    bsz, n, h, dh = 2, 32, 4, 64
    c = h * dh
    qkv = rng.standard_normal((bsz, n, 3 * c)).astype(np.float32)
    bn = 128
    n_nb = 3 * c // bn
    # quantize per (row, n-block) the way the q8_out epilogue does
    q2 = qkv.reshape(bsz * n, 3 * c)
    ys = np.zeros((n_nb, bsz * n, 1), np.float32)
    qq = np.zeros_like(q2, np.int8)
    for j in range(n_nb):
        blk = q2[:, j * bn:(j + 1) * bn]
        s = np.maximum(np.abs(blk).max(axis=1, keepdims=True) / 127.0, 1e-12)
        qq[:, j * bn:(j + 1) * bn] = np.clip(np.round(blk / s), -127, 127)
        ys[j] = s
    got = fused_qkv_attention_i8(jnp.asarray(qq).reshape(bsz, n, 3 * c),
                                 jnp.asarray(ys), h, interpret=True)
    r = qkv.reshape(bsz, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
    ref = np.asarray(attention_xla(jnp.asarray(r[0]), jnp.asarray(r[1]),
                                   jnp.asarray(r[2])))
    ref = ref.transpose(0, 2, 1, 3).reshape(bsz, n, c)
    rel = np.abs(np.asarray(got, np.float32) - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


# ---------------------------------------------------------------------------
# SmoothQuant-style equalization (ops/int8.equalize_params)
# ---------------------------------------------------------------------------

def _tiny_tae_params(outlier: float = 1.0, seed: int = 0):
    from tae_tpu import models

    model = models.create("tae_patch16_vocab16_px256", img_size=64,
                          embed_dim=64, depth=2, num_heads=4,
                          decoder_embed_dim=64, decoder_depth=2,
                          decoder_num_heads=4)
    params = model.init(jax.random.key(seed))
    if outlier != 1.0:
        # inject per-channel activation outliers the way trained transformers
        # grow them: a few LN affine channels much larger than the rest.
        # norm2 (the MLP pair) only: outlier channels in norm1 saturate the
        # attention softmax, and a near-argmax softmax amplifies ANY
        # perturbation chaotically — which would swamp what this fixture is
        # meant to isolate (quantization error).
        for half in ("encoder", "decoder"):
            blk = params[half]["blocks"]
            g = np.array(blk["norm2"]["scale"])
            g[:, ::13] *= outlier
            blk["norm2"]["scale"] = jnp.asarray(g)
    return model, params


def test_equalize_params_is_exact_in_float():
    """The equalization rewrite is mathematically exact: the float forward
    is unchanged (up to fp32 rounding) while LN scales get flattened."""
    from tae_tpu.ops.int8 import equalize_params

    model, params = _tiny_tae_params(outlier=37.0)
    eq = equalize_params(params, alpha=0.5)
    from tae_tpu.utils.dtypes import Policy

    pol = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 3, 64, 64)).astype(np.float32))
    loss0, pred0 = model.forward(params, imgs, policy=pol)
    loss1, pred1 = model.forward(eq, imgs, policy=pol)
    p0, p1 = np.asarray(pred0), np.asarray(pred1)
    # fp32-rounding-level agreement, relative to the output magnitude (the
    # injected 37x outliers amplify absolute values)
    assert np.abs(p1 - p0).max() <= 1e-4 * np.abs(p0).max()
    # the rewrite actually happened: LN scale spread shrank
    g0 = np.abs(np.asarray(params["encoder"]["blocks"]["norm2"]["scale"]))
    g1 = np.abs(np.asarray(eq["encoder"]["blocks"]["norm2"]["scale"]))
    assert g1.max() / g1.mean() < g0.max() / g0.mean()


def test_equalize_params_improves_int8_accuracy_on_outliers():
    """With injected LN-channel outliers, per-row activation quantization
    loses most of its code range to the outlier channels; equalization
    recovers it (the SmoothQuant effect, arXiv:2211.10438)."""
    from tae_tpu.ops.int8 import equalize_params, quantize_params

    from tae_tpu.utils.dtypes import Policy

    pol = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    model, params = _tiny_tae_params(outlier=37.0)
    imgs = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3, 64, 64)).astype(np.float32))
    z_fp = np.asarray(model.forward_encoder(params, imgs, policy=pol))
    scale = np.abs(z_fp).max() + 1e-9

    z_q = np.asarray(model.forward_encoder(quantize_params(params), imgs,
                                           policy=pol))
    z_eq = np.asarray(model.forward_encoder(
        quantize_params(equalize_params(params, alpha=0.5)), imgs, policy=pol))
    err_q = np.abs(z_q - z_fp).max() / scale
    err_eq = np.abs(z_eq - z_fp).max() / scale
    assert err_eq < err_q / 2, (err_q, err_eq)


def test_equalize_params_calibrated_stats_override_proxy():
    """act_amax trees (true calibration stats) replace the LN-affine proxy."""
    from tae_tpu.ops.int8 import equalize_params

    model, params = _tiny_tae_params()
    d = params["encoder"]["blocks"]["norm1"]["scale"].shape
    stats = {"encoder": {"blocks": {"attn": {"qkv": {
        "x_amax": jnp.full(d, 3.0, jnp.float32)}}}}}
    eq_proxy = equalize_params(params, alpha=0.5)
    eq_cal = equalize_params(params, alpha=0.5, act_amax=stats)
    a = np.asarray(eq_proxy["encoder"]["blocks"]["attn"]["qkv"]["w"])
    b = np.asarray(eq_cal["encoder"]["blocks"]["attn"]["qkv"]["w"])
    assert not np.allclose(a, b)
    # un-calibrated pairs keep the proxy rewrite
    a2 = np.asarray(eq_proxy["encoder"]["blocks"]["mlp"]["fc1"]["w"])
    b2 = np.asarray(eq_cal["encoder"]["blocks"]["mlp"]["fc1"]["w"])
    np.testing.assert_allclose(a2, b2)


def test_serving_softmax_total_on_underflowing_scores():
    """All-scores-below-exp-underflow rows must produce finite (uniform)
    attention, not NaN (reciprocal of a zero sum) — and the serving=False
    wide path must match the XLA reference exactly even there."""
    from tae_tpu.ops.pallas.flash_attention import (
        fused_qkv_attention, fused_qkv_attention_wide, _wide_reference)

    n, h, dh = 4, 2, 64
    c = h * dh
    qkv = np.zeros((2, n, 3 * c), np.float32)
    qkv[:, :, :c] = 40.0          # q rows aligned
    qkv[:, :, c:2 * c] = -40.0    # k rows anti-aligned: s = -40*40*64*scale
    qkv[:, :, 2 * c:] = np.random.default_rng(0).standard_normal((2, n, c))
    qkv = jnp.asarray(qkv)
    ref = _wide_reference(qkv, h, None)
    assert np.isfinite(np.asarray(ref)).all()
    out_s = fused_qkv_attention_wide(qkv, h, interpret=True)          # serving
    out_t = fused_qkv_attention_wide(qkv, h, interpret=True, serving=False)
    assert np.isfinite(np.asarray(out_s)).all()
    # uniform-attention rows: both paths equal the reference
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref), atol=2e-5)
    # per-batch serving kernel too (N>=128 regime shape)
    n2 = 128
    qkv2 = np.zeros((1, n2, 3 * c), np.float32)
    qkv2[:, :, :c] = 40.0
    qkv2[:, :, c:2 * c] = -40.0
    qkv2[:, :, 2 * c:] = 1.0
    out2 = fused_qkv_attention(jnp.asarray(qkv2), h, interpret=True)
    assert np.isfinite(np.asarray(out2)).all()


def test_fused_qkv_attention_serving_false_exact_outside_clamps():
    """The differentiable (serving=False) per-batch primal must equal the
    XLA reference for logits OUTSIDE the serving clamp window [-60, 45] —
    i.e. f(x) == primal of value_and_grad(f)(x) on the bf16 N>=128 dispatch
    (ADVICE r2: the clamped serving softmax silently distorted trained
    models with large attention logits on a non-opt-in path)."""
    from tae_tpu.ops.pallas.flash_attention import (
        fused_qkv_attention, _wide_reference)

    n, h, dh = 128, 2, 64
    c = h * dh
    rng = np.random.default_rng(1)
    # scale q so max logits land ~O(100): rows are NOT uniform, so the
    # clamped softmax genuinely diverges from the exact one here
    qkv = rng.standard_normal((2, n, 3 * c)).astype(np.float32)
    qkv[:, :, :c] *= 30.0
    qkv = jnp.asarray(qkv)
    ref = _wide_reference(qkv, h, None)
    out_exact = fused_qkv_attention(qkv, h, interpret=True, serving=False)
    np.testing.assert_allclose(np.asarray(out_exact), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # sanity: the clamped serving kernel DOES diverge on these scores
    # (otherwise this test exercises nothing)
    out_serv = fused_qkv_attention(qkv, h, interpret=True, serving=True)
    assert np.abs(np.asarray(out_serv) - np.asarray(ref)).max() > 1e-3
    # and the custom-VJP forward (with_lse) agrees with the primal
    def f(q):
        return jnp.sum(fused_qkv_attention(q, h, None, True, False))
    val, _ = jax.value_and_grad(f)(qkv)
    np.testing.assert_allclose(float(val), float(jnp.sum(out_exact)),
                               rtol=1e-5)


def test_int8_block_ln_chain_matches_float_stack():
    """Multi-layer int8 serving with LN chaining — norm2 fused into the
    proj epilogue, the next layer's norm1 fused into the MLP epilogue
    (r3) — vs the float stack, and vs the unchained int8 path (which
    differs only by the bf16 rounding of the residual stream the
    standalone ln_quant re-reads)."""
    from tae_tpu.nn.vit import BlockConfig, block_apply, block_init, \
        int8_block_apply
    from tae_tpu.ops.int8 import quantize_params

    cfg = BlockConfig(dim=128, num_heads=4)
    layers = [block_init(jax.random.key(40 + i), cfg) for i in range(3)]
    qlayers = [quantize_params(p) for p in layers]
    x = jax.random.normal(jax.random.key(50), (2, 16, 128), jnp.float32)

    ref = x
    for p in layers:
        ref = block_apply(p, ref, cfg, backend="xla")

    got, ln = x, None
    for i, pq in enumerate(qlayers):
        n1n = qlayers[i + 1]["norm1"] if i + 1 < len(qlayers) else None
        got, ln = int8_block_apply(pq, got, cfg, interpret=True,
                                   ln_in=ln, norm1_next=n1n, chain=True)
    assert ln is None  # last layer has no successor to chain into

    unchained = x
    for pq in qlayers:
        unchained = int8_block_apply(pq, unchained, cfg, interpret=True)

    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.05, rel
    rel_u = float(jnp.mean(jnp.abs(got - unchained))
                  / jnp.mean(jnp.abs(unchained)))
    assert rel_u < 0.02, rel_u


def test_int8_final_norm_head_chain_matches_standalone():
    """The final LN + head-input quantize chained into the last block's MLP
    epilogue (models/tae._blocks_then_head) must match the standalone
    LN -> quantized-head path to int8 tolerance."""
    from tae_tpu.nn.vit import (BlockConfig, _qlinear, block_init,
                                int8_block_apply, layer_norm_apply,
                                layer_norm_init)
    from tae_tpu.ops.int8 import quantize_params, quantize_weight

    cfg = BlockConfig(dim=128, num_heads=4)
    p = block_init(jax.random.key(60), cfg)
    pq = quantize_params(p)
    fnorm = layer_norm_init(128)
    fnorm = {"scale": fnorm["scale"] * 1.3 + 0.1, "bias": fnorm["bias"] + 0.2}
    w_head = jax.random.normal(jax.random.key(61), (128, 16), jnp.float32)
    wq, sw = quantize_weight(w_head)
    x = jax.random.normal(jax.random.key(62), (2, 16, 128), jnp.float32)

    x1, ln = int8_block_apply(pq, x, cfg, interpret=True,
                              norm1_next=fnorm, chain=True)
    assert ln is not None
    xq, sx = ln
    got = _qlinear({"w_q": wq, "w_scale": sw}, xq, x_scale=sx,
                   out_dtype=jnp.float32, interpret=True)
    got = got.reshape(2, 16, 16)

    ref_in = layer_norm_apply(fnorm, x1, cfg.ln_eps)
    ref = (ref_in.reshape(-1, 128) @ w_head).reshape(2, 16, 16)
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.04, rel


def test_serving_flag_threads_to_attention_kernels(monkeypatch):
    """Tokenizer/encode inference passes serving=True down to the fused
    attention kernels (the r2d clamped-softmax win); the default stays
    serving=False so differentiable/parity paths keep the exact softmax."""
    import tae_tpu.ops.pallas.flash_attention as fa
    from tae_tpu.nn import vit

    seen = []

    def fake_fused(qkv, h, scale=None, serving=False, **kw):
        seen.append(serving)
        b, n, c3 = qkv.shape
        return qkv[..., : c3 // 3]

    monkeypatch.setattr(fa, "fused_qkv_attention", fake_fused)
    cfg = vit.AttentionConfig(dim=64, num_heads=4)
    p = vit.attention_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 256, 64), jnp.float32)
    vit.attention_apply(p, x, cfg, backend="pallas", serving=True)
    vit.attention_apply(p, x, cfg, backend="pallas")
    assert seen == [True, False]


def test_int8_block_chain_fallback_infeasible_plan(monkeypatch):
    """When the LN-chain epilogue can't run — kill switch TAE_TPU_LN_CHAIN=0
    or a VMEM-infeasible full-row plan (the d=2560 p64/p128 proj shape) —
    the chained call must fall back to the standalone ln_quant path, NOT
    crash on tuple arity (r3 regression: int8_linear returned a bare array
    while the block caller unpacked three values)."""
    from tae_tpu.nn.vit import BlockConfig, block_init, int8_block_apply
    from tae_tpu.ops.int8 import quantize_params

    cfg = BlockConfig(dim=128, num_heads=4)
    layers = [block_init(jax.random.key(70 + i), cfg) for i in range(2)]
    qlayers = [quantize_params(p) for p in layers]
    x = jax.random.normal(jax.random.key(71), (2, 16, 128), jnp.float32)

    unchained = x
    for pq in qlayers:
        unchained = int8_block_apply(pq, unchained, cfg, interpret=True)

    for env, val in (("TAE_TPU_LN_CHAIN", "0"),
                     ("TAE_TPU_I8_VMEM_BUDGET", "65536")):
        monkeypatch.setenv(env, val)
        got, ln = x, None
        for i, pq in enumerate(qlayers):
            n1n = qlayers[i + 1]["norm1"] if i + 1 < len(qlayers) else None
            got, ln = int8_block_apply(pq, got, cfg, interpret=True,
                                       ln_in=ln, norm1_next=n1n, chain=True)
        assert ln is None
        rel = float(jnp.mean(jnp.abs(got - unchained))
                    / jnp.mean(jnp.abs(unchained)))
        assert rel < 0.02, (env, rel)
        monkeypatch.delenv(env)


def test_plan_blocks_traffic_and_vmem():
    """The r3 block planner: small m keeps the serve blocking, large m
    scales bm up (weight re-streams shrink), and every plan respects the
    calibrated VMEM model (the p64 patch-embed shape that OOM'd under the
    naive model must not pick bm=1024)."""
    from tae_tpu.ops.int8 import _block_k, _plan_blocks

    from tae_tpu.ops.int8 import vmem_limit

    # serve-latency regime: one m-block, r2c bn
    assert _plan_blocks(8, 2560, 7680) == (32, 512, 2560)
    # p16 qkv (m=32768): large bm, weight re-streams drop 128x -> 16x
    # under the raised (32M-limit) budget
    bm, bn, bk = _plan_blocks(32768, 1024, 3072)
    assert bm >= 1024 and bk == 1024 and bn >= 512
    # the shape that OOM'd on-chip under the naive model (16.36M vs 16M)
    # must still respect the (now limit-proportional) budget
    bm, bn, bk = _plan_blocks(2048, 12288, 2560)
    assert bk == 3072
    vm = 3 * bm * bk + 2 * bk * bn + 4 * bm * bn + 2 * 2 * bm * bn
    assert vm <= vmem_limit() * 7 // 8, (bm, bn, bk, vm)
    # small-M clamp: m_pad <= 1024 keeps the r3-validated 14M budget
    # (the 28M plans measured -7.5% on p128 b256; see docs/KERNELS.md)
    bm, bn, bk = _plan_blocks(1024, 2560, 7680)
    vm = 3 * bm * bk + 2 * bk * bn + 4 * bm * bn + 2 * 2 * bm * bn
    assert vm <= 14 << 20, (bm, bn, bk, vm)
    # plans always tile evenly
    for m, k, n in ((32768, 1024, 1024), (2048, 2560, 7680),
                    (1024, 2560, 2560), (40, 512, 4096)):
        bm, bn, bk = _plan_blocks(m, k, n)
        m_pad = -(-m // 32) * 32
        assert m_pad % bm == 0 or bm == m_pad
        assert n % bn == 0 and k % bk == 0


def test_plan_blocks_explicit_budget_overrides_small_m_clamp(monkeypatch):
    """TAE_TPU_I8_VMEM_BUDGET (or an explicit budget=) is a tuning override
    and must reach the planner even in the m_pad <= 1024 regime, where a
    default run keeps the r3-validated 14M clamp (r3s9 fix: the clamp used
    to silently re-cap the override, so on-chip re-tuning runs measured the
    14M plans while claiming 28M)."""
    from tae_tpu.ops.int8 import _plan_blocks

    default_plan = _plan_blocks(1024, 2560, 7680)
    arg_plan = _plan_blocks(1024, 2560, 7680, budget=28 << 20)
    monkeypatch.setenv("TAE_TPU_I8_VMEM_BUDGET", str(28 << 20))
    env_plan = _plan_blocks(1024, 2560, 7680)
    monkeypatch.delenv("TAE_TPU_I8_VMEM_BUDGET")

    assert env_plan == arg_plan
    # the 28M budget admits a lower-traffic plan the 14M clamp rejects
    assert arg_plan != default_plan, (arg_plan, default_plan)
    bm, bn, bk = arg_plan
    vm = 3 * bm * bk + 2 * bk * bn + 4 * bm * bn + 2 * 2 * bm * bn
    assert vm > 14 << 20


def test_ln_chain_bm_scans_past_failing_pad_free_candidate(monkeypatch):
    """The pad-free-first reorder breaks descending-bm order, so a small
    pad-free candidate failing the traffic bound must not abandon the chain
    (r3s9 fix: the loop `break`-ed there). m=2816 (batch 11 x 256 tokens):
    pad-free 256 restreams the weights 11x and loses to unchained+ln_quant,
    but 512 restreams 6x and wins — the chain must pick it."""
    from tae_tpu.ops.pallas.int8_block import _ln_chain_bm

    assert _ln_chain_bm(2816, 1024, 4096, 512, 1024) == 512
    # and the FORCE knob bypasses both bounds instead of being dead code
    # behind the traffic break
    monkeypatch.setenv("TAE_TPU_INT8_MLP_LN_BUDGET", "1024")
    assert _ln_chain_bm(2816, 1024, 4096, 512, 1024) is None
    monkeypatch.setenv("TAE_TPU_INT8_MLP_LN_FORCE", "1")
    assert _ln_chain_bm(2816, 1024, 4096, 512, 1024) is not None


@pytest.mark.parametrize("b,n,h,dh", [(16, 4, 32, 80), (8, 16, 32, 80),
                                      (4, 64, 8, 64)])
def test_fused_qkv_attention_wide_q8_2d_matches_3d(b, n, h, dh):
    """The flat-layout (B*N, 3C) serving entry is bit-identical to the 3D
    wide q8 kernel — it exists purely to delete the HBM retiles the 3D
    entry forces when n is below the 8-row sublane tile (r5 profile: 8.4%
    of the p128 int8 encode iteration)."""
    from tae_tpu.ops.pallas.flash_attention import (
        fused_qkv_attention_wide_q8, fused_qkv_attention_wide_q8_2d)

    c = h * dh
    qkv = jax.random.normal(jax.random.key(41), (b, n, 3 * c), jnp.float32)
    oq3, sc3 = fused_qkv_attention_wide_q8(qkv, h, interpret=True)
    oq2, sc2 = fused_qkv_attention_wide_q8_2d(qkv.reshape(b * n, 3 * c), n, h,
                                              interpret=True)
    assert oq2.shape == (b * n, c) and sc2.shape == (b * n, 1)
    np.testing.assert_array_equal(np.asarray(oq2),
                                  np.asarray(oq3).reshape(b * n, c))
    np.testing.assert_array_equal(np.asarray(sc2),
                                  np.asarray(sc3).reshape(b * n, 1))
