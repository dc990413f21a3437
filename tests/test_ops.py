"""Tests for norms, rope, and attention (XLA vs Pallas-interpret parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.ops import attention, apply_rotary, layer_norm, rms_norm, rope_cos_sin
from ullava_tpu.ops.attention import attention_xla


def test_rms_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((16,)).astype(np.float32)

    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    ref = (xt * torch.rsqrt(var + 1e-6) * torch.tensor(w)).numpy()

    out = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((16,)).astype(np.float32)
    b = np.random.default_rng(2).standard_normal((16,)).astype(np.float32)
    ref = torch.nn.functional.layer_norm(
        torch.tensor(x), (16,), torch.tensor(w), torch.tensor(b)
    ).numpy()
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_rope_matches_hf_reference():
    """Check against a direct implementation of HF's rotate_half rope."""
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 7, 3, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))

    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    ang = pos[..., None] * inv  # [B,S,D/2]
    cos = np.cos(np.concatenate([ang, ang], -1))[:, :, None, :]
    sin = np.sin(np.concatenate([ang, ang], -1))[:, :, None, :]

    def rot(x):
        return np.concatenate([-x[..., D // 2 :], x[..., : D // 2]], -1)

    ref_q = q * cos + rot(q) * sin

    c, s = rope_cos_sin(jnp.asarray(pos), D)
    out_q, out_k = apply_rotary(jnp.asarray(q), jnp.asarray(k), c, s)
    np.testing.assert_allclose(np.asarray(out_q), ref_q, atol=1e-5)


def test_attention_causal_matches_naive():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 16, 2, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)

    out = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    # naive per-row softmax
    ref = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            s = q[b, :, h] @ k[b, :, h].T / np.sqrt(D)
            for i in range(S):
                w = np.exp(s[i, : i + 1] - s[i, : i + 1].max())
                w = w / w.sum()
                ref[b, i, h] = w @ v[b, : i + 1, h]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_attention_kv_lens_ignores_padding():
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 12, 2, 8
    q = rng.standard_normal((B, 1, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    lens = jnp.asarray([5, 12], dtype=jnp.int32)

    out = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_lens=lens)
    k2, v2 = k.copy(), v.copy()
    k2[0, 5:] = 999.0  # garbage beyond length must not matter
    v2[0, 5:] = -999.0
    out2 = attention_xla(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), kv_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("lens", [None, (200, 256), (128, 77)])
def test_flash_matches_xla_interpret(causal, lens):
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 256, 2, 128
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    kv_lens = None if lens is None else jnp.asarray(lens, dtype=jnp.int32)

    ref = attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal, kv_lens=kv_lens
    )
    out = attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, kv_lens=kv_lens, impl="flash_interpret",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_flash_gradients_match_xla():
    rng = np.random.default_rng(0)
    B, S, H, D = 1, 128, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype=jnp.float32)

    def loss_flash(q, k, v):
        return attention(q, k, v, causal=True, impl="flash_interpret").sum()

    def loss_xla(q, k, v):
        return attention(q, k, v, causal=True, impl="xla").sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_attention_rejects_bad_flash_shapes():
    q = jnp.zeros((1, 8, 2, 64))
    with pytest.raises(ValueError):
        attention(q, q, q, impl="flash")


@pytest.mark.parametrize("lens", [None, (200, 77)])
def test_flash_bwd_kernels_match_xla_grads(lens):
    """The fused Pallas backward (dq/dkv kernels) reproduces XLA grads
    under causal + ragged KV masking."""
    rng = np.random.default_rng(3)
    B, S, H, D = 2, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    kv_lens = None if lens is None else jnp.asarray(lens, jnp.int32)

    def loss(impl):
        def f(q, k, v):
            out = attention(q, k, v, causal=True, kv_lens=kv_lens, impl=impl)
            return (out.astype(jnp.float32) ** 2).sum()
        return f

    g1 = jax.grad(loss("flash_interpret"), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3)


def test_fused_mlp_block_matches_xla_interpret():
    """Fused LN+fc1+gelu+fc2+residual kernel == the unfused XLA ops on a
    quantized MLP (serving path for the frozen SAM tower)."""
    from ullava_tpu.ops.mlp_kernel import fused_mlp_block
    from ullava_tpu.ops.norms import layer_norm
    from ullava_tpu.ops.quant import apply_linear, quantize_int8

    rng = np.random.default_rng(0)
    T, C, F = 1024, 256, 1024
    x = jnp.asarray(rng.standard_normal((T, C)), jnp.float32)
    w1 = quantize_int8(jnp.asarray(rng.standard_normal((C, F)) * 0.05, jnp.float32))
    w2 = quantize_int8(jnp.asarray(rng.standard_normal((F, C)) * 0.05, jnp.float32))
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)

    y = layer_norm(x, ln_s, ln_b, 1e-6)
    y = jax.nn.gelu(apply_linear(y, w1) + b1, approximate=False)
    ref = x + apply_linear(y, w2) + b2

    out = fused_mlp_block(
        x, ln_s, ln_b, w1["q"], w1["scale"], b1, w2["q"], w2["scale"], b2,
        1e-6, block_t=256, f_chunk=512, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-4
    )


def test_fused_mlp_block_w8a8_close():
    """int8-activation mode: per-row dynamic quantization keeps the fused
    MLP within ~1% relative of the weight-only-int8 XLA computation."""
    from ullava_tpu.ops.mlp_kernel import fused_mlp_block
    from ullava_tpu.ops.norms import layer_norm
    from ullava_tpu.ops.quant import apply_linear, quantize_int8

    rng = np.random.default_rng(1)
    T, C, F = 512, 256, 1024
    x = jnp.asarray(rng.standard_normal((T, C)), jnp.float32)
    w1 = quantize_int8(jnp.asarray(rng.standard_normal((C, F)) * 0.05, jnp.float32))
    w2 = quantize_int8(jnp.asarray(rng.standard_normal((F, C)) * 0.05, jnp.float32))
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)

    y = layer_norm(x, ln_s, ln_b, 1e-6)
    y = jax.nn.gelu(apply_linear(y, w1) + b1, approximate=False)
    ref = np.asarray(x + apply_linear(y, w2) + b2)

    out = np.asarray(fused_mlp_block(
        x, ln_s, ln_b, w1["q"], w1["scale"], b1, w2["q"], w2["scale"], b2,
        1e-6, block_t=256, f_chunk=512, w8a8=True, interpret=True,
    ))
    err = np.abs(out - ref)
    scale = np.abs(ref).max()
    assert err.max() / scale < 0.02, (err.max(), scale)
    assert err.mean() / scale < 0.002, (err.mean(), scale)


def test_fused_ln_linear_matches_xla_interpret():
    import jax.numpy as jnp

    from ullava_tpu.ops.mlp_kernel import fused_ln_linear
    from ullava_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(11)
    N, T, C, F = 4, 196, 256, 384
    x = jnp.asarray(rng.standard_normal((N, T, C)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    lnb = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 127, (C, F)), jnp.int8)
    ws = jnp.asarray(rng.random((1, F)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)), jnp.float32)

    normed = layer_norm(x, lns, lnb, 1e-6)
    ref = normed @ (w.astype(jnp.float32) * ws) + b

    # weight-only path: bit-comparable to the XLA reference
    got = fused_ln_linear(x, lns, lnb, w, ws, b, 1e-6, w8a8=False,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # w8a8 path: adds per-row int8 activation error only
    got8 = fused_ln_linear(x, lns, lnb, w, ws, b, 1e-6, w8a8=True,
                           interpret=True)
    denom = np.abs(np.asarray(ref)).mean()
    assert np.abs(np.asarray(got8) - np.asarray(ref)).mean() / denom < 0.02
    # 2-D flat form
    got2 = fused_ln_linear(x[0], lns, lnb, w, ws, b, 1e-6, w8a8=False,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref[0]),
                               rtol=2e-2, atol=2e-2)


def test_fused_linear_residual_matches_xla_interpret():
    """No-LN variant with a fused residual add (the resident window
    path's output projection)."""
    import jax.numpy as jnp

    from ullava_tpu.ops.mlp_kernel import fused_linear

    rng = np.random.default_rng(12)
    N, T, C, F = 4, 196, 256, 256
    x = jnp.asarray(rng.standard_normal((N, T, C)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((N, T, F)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 127, (C, F)), jnp.int8)
    ws = jnp.asarray(rng.random((1, F)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)), jnp.float32)

    ref = x @ (w.astype(jnp.float32) * ws) + b + res

    got = fused_linear(x, w, ws, b, residual=res, w8a8=False,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    got8 = fused_linear(x, w, ws, b, residual=res, w8a8=True,
                        interpret=True)
    denom = np.abs(np.asarray(ref)).mean()
    assert np.abs(np.asarray(got8) - np.asarray(ref)).mean() / denom < 0.02


def test_rms_norm_pallas_parity_fwd_bwd():
    """Pallas RMSNorm (interpret) == XLA formula, values AND grads."""
    from ullava_tpu.ops.norms import _rms_norm_pallas

    rng = np.random.default_rng(3)
    rows, D = 32, 256
    x = jnp.asarray(rng.standard_normal((rows, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((rows, D)), jnp.float32)

    def ref(x, w):
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(var + 1e-6) * w

    y, vjp = jax.vjp(lambda x, w: _rms_norm_pallas(x, w, 1e-6, True), x, w)
    y_ref, vjp_ref = jax.vjp(ref, x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    dx, dw = vjp(dy)
    dx_ref, dw_ref = vjp_ref(dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw), np.asarray(dw_ref), rtol=2e-5, atol=1e-4
    )


def test_rms_norm_pallas_bf16_and_multiblock():
    """bf16 inputs, multiple grid blocks (rows > block), dw accumulation."""
    from ullava_tpu.ops.norms import _rms_norm_pallas

    rng = np.random.default_rng(4)
    rows, D = 48, 128  # block 16 -> 3 grid steps
    x = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D,)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)

    def ref(x, w):
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + 1e-6) * w.astype(jnp.float32)).astype(
            x.dtype
        )

    y, vjp = jax.vjp(lambda x, w: _rms_norm_pallas(x, w, 1e-6, True), x, w)
    y_ref, vjp_ref = jax.vjp(ref, x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    dx, dw = vjp(dy)
    dx_ref, dw_ref = vjp_ref(dy)
    assert dx.dtype == x.dtype and dw.dtype == w.dtype
    np.testing.assert_allclose(
        np.asarray(dx, np.float32), np.asarray(dx_ref, np.float32),
        atol=0.05, rtol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(dw, np.float32), np.asarray(dw_ref, np.float32),
        atol=0.3, rtol=0.05,
    )


def test_silu_mul_quant_matches_a8_chain():
    """Fused silu-mul-quantize == the XLA apply_linear_a8 quantization of
    silu(g)*u: identical int8 rows and scales, and identical down-proj
    output when paired with apply_linear_a8_prequant."""
    from ullava_tpu.ops.mlp_kernel import silu_mul_quant
    from ullava_tpu.ops.quant import (
        apply_linear_a8,
        apply_linear_a8_prequant,
        quantize_int8,
    )

    rng = np.random.default_rng(6)
    rows, F, C = 48, 256, 128
    g = jnp.asarray(rng.standard_normal((rows, F)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((rows, F)), jnp.float32)
    w = quantize_int8(jnp.asarray(rng.standard_normal((F, C)) * 0.05, jnp.float32))

    gated = jax.nn.silu(g) * u
    ref_y = apply_linear_a8(gated, w)

    gq, gs = silu_mul_quant(g, u, interpret=True)
    # Reference quantization restated:
    hf = np.asarray(gated, np.float32)
    amax = np.maximum(np.abs(hf).max(axis=1, keepdims=True), 1e-12)
    ref_q = np.round(hf * (127.0 / amax)).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(gq), ref_q)
    np.testing.assert_allclose(np.asarray(gs), amax, rtol=1e-6)

    y = apply_linear_a8_prequant(gq, gs, w, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref_y), rtol=1e-5, atol=1e-5
    )


def test_silu_mul_quant_bf16():
    from ullava_tpu.ops.mlp_kernel import silu_mul_quant

    rng = np.random.default_rng(7)
    rows, F = 16, 384
    g = jnp.asarray(rng.standard_normal((rows, F)), jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((rows, F)), jnp.bfloat16)
    gq, gs = silu_mul_quant(g, u, interpret=True)
    hf = np.asarray(g, np.float32)
    hf = hf * (1.0 / (1.0 + np.exp(-hf))) * np.asarray(u, np.float32)
    amax = np.maximum(np.abs(hf).max(axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(np.asarray(gs), amax, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gq, np.int32),
        np.round(hf * (127.0 / amax)).astype(np.int32),
        atol=1,
    )


def test_fused_rotary_matches_apply_rotary():
    """The one-pass serving rope kernel (interpret mode) == the fp32
    apply_rotary reference on flat rows, to bf16 output rounding, for
    both the hd=128 LLaMA shape and a 2-heads-per-128-lane hd=64 shape."""
    from ullava_tpu.ops.rope import fused_rotary

    rng = np.random.default_rng(6)
    for H, hd in ((4, 128), (4, 64)):
        B, S = 2, 8
        q = jnp.asarray(
            rng.standard_normal((B, S, H, hd)), jnp.bfloat16
        )
        pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        c, s = rope_cos_sin(pos, hd)
        ref, _ = apply_rotary(q, q, c, s)  # fp32 compute path
        got = fused_rotary(
            q.reshape(B * S, H * hd),
            c.reshape(B * S, hd).astype(jnp.float32),
            s.reshape(B * S, hd).astype(jnp.float32),
            hd,
            interpret=True,
        ).reshape(B, S, H, hd)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_rms_norm_quant_kernels_match_xla_recipe():
    """Fused (residual +) RMSNorm + per-row int8 quantize (interpret) ==
    the XLA chain (rms_norm then apply_linear_a8's quantize recipe),
    including the returned residual stream and raw abs-max scales."""
    from ullava_tpu.ops.norms import (
        rms_norm,
        rms_norm_quant,
        rms_norm_residual_quant,
    )

    rng = np.random.default_rng(7)
    rows, D = 32, 256
    x = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    w = jnp.asarray(1.0 + 0.1 * rng.standard_normal((D,)), jnp.bfloat16)

    def ref_quant(h):
        # fp32 norm formula (the kernel quantizes from the fp32 normed
        # values; the unfused XLA chain rounds through bf16 first, which
        # the fused path deliberately skips — strictly less rounding).
        hf = h.astype(jnp.float32)
        var = jnp.mean(jnp.square(hf), axis=-1, keepdims=True)
        n = hf * jax.lax.rsqrt(var + 1e-6) * w.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(n), axis=-1, keepdims=True), 1e-12)
        return jnp.round(n * (127.0 / amax)).astype(jnp.int8), amax

    xq, xs = rms_norm_quant(x, w, 1e-6, interpret=True)
    rq, rs = ref_quant(x)
    # int8 round can differ by 1 LSB at exact .5 boundaries under fp32
    # reassociation; require >=99.9% exact and the rest within 1.
    diff = np.abs(np.asarray(xq, np.int32) - np.asarray(rq, np.int32))
    assert (diff <= 1).all() and (diff == 0).mean() > 0.999
    np.testing.assert_allclose(np.asarray(xs), np.asarray(rs), rtol=1e-6)

    h, xq2, xs2 = rms_norm_residual_quant(x, res, w, 1e-6, interpret=True)
    h_sum = x.astype(jnp.float32) + res.astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(h), np.asarray(h_sum.astype(jnp.bfloat16))
    )
    # The kernel norms/quantizes the fp32 sum (the bf16 rounding applies
    # only to the carried residual stream h).
    rq2, rs2 = ref_quant(h_sum)
    diff2 = np.abs(np.asarray(xq2, np.int32) - np.asarray(rq2, np.int32))
    assert (diff2 <= 1).all() and (diff2 == 0).mean() > 0.999
    np.testing.assert_allclose(np.asarray(xs2), np.asarray(rs2), rtol=1e-5)
