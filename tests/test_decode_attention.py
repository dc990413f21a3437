"""int8 KV cache: kernel parity + decoder integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ullava_tpu.models import llama
from ullava_tpu.ops.decode_attention import (
    decode_attention_int8,
    decode_attention_int8_fused_write,
    decode_attention_int8_xla,
    quantize_kv_rows,
)


def _rand_case(rng, L=3, B=2, S=256, H=4, hd=128):
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, S, H, hd)), jnp.float32)
    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    lens = jnp.asarray([S, S // 2 + 3], jnp.int32)
    kq = kq.reshape(L, B, S, H * hd)
    vq = vq.reshape(L, B, S, H * hd)
    return q, kq, vq, ks, vs, lens


def test_decode_kernel_matches_xla_reference():
    rng = np.random.default_rng(0)
    q, kq, vq, ks, vs, lens = _rand_case(rng)
    scale = 128**-0.5
    layer = jnp.int32(1)
    ref = decode_attention_int8_xla(q, kq, vq, ks, vs, lens, layer, scale=scale)
    got = decode_attention_int8(
        q, kq, vq, ks, vs, lens, layer, scale=scale, block_b=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_decode_kernel_single_block():
    rng = np.random.default_rng(1)
    q, kq, vq, ks, vs, lens = _rand_case(rng, S=96)
    scale = 128**-0.5
    layer = jnp.int32(2)
    ref = decode_attention_int8_xla(q, kq, vq, ks, vs, lens, layer, scale=scale)
    got = decode_attention_int8(
        q, kq, vq, ks, vs, lens, layer, scale=scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_write_kernel_matches_scatter_then_attend():
    """Write-and-attend parity: the fused kernel's attention output AND its
    in-kernel cache-row writes must match the XLA quantize-scatter + attend
    sequence exactly (same dequantize-in-dot math)."""
    rng = np.random.default_rng(6)
    L, B, S, H, hd = 3, 4, 256, 4, 128
    C = H * hd
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    hist = jnp.asarray(rng.standard_normal((L, B, S, H, hd)), jnp.float32)
    kq0, ks0 = quantize_kv_rows(hist)
    vq0, vs0 = quantize_kv_rows(hist[::-1])
    cache_k = kq0.reshape(L, B, S, C)
    cache_v = vq0.reshape(L, B, S, C)
    write_pos = jnp.asarray([S // 2, S - 1, 7, 100], jnp.int32)
    lens = write_pos + 1
    layer = jnp.int32(1)
    scale = hd**-0.5
    k_new = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    kqn, ksn = quantize_kv_rows(k_new)
    vqn, vsn = quantize_kv_rows(v_new)

    # Reference: scatter the quantized row, then attend over the cache.
    b_idx = jnp.arange(B)
    rk = cache_k.at[layer, b_idx, write_pos].set(kqn.reshape(B, C))
    rv = cache_v.at[layer, b_idx, write_pos].set(vqn.reshape(B, C))
    rks = ks0.at[layer, b_idx, write_pos].set(ksn)
    rvs = vs0.at[layer, b_idx, write_pos].set(vsn)
    ref = decode_attention_int8_xla(
        q, rk, rv, rks, rvs, lens, layer, scale=scale
    )

    attn, ck, cv, cks, cvs = decode_attention_int8_fused_write(
        q, kqn.reshape(B, C), ksn, vqn.reshape(B, C), vsn,
        cache_k, cache_v, ks0, vs0, write_pos, layer,
        scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(cks), np.asarray(rks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cvs), np.asarray(rvs), rtol=1e-6)


def test_quantize_kv_rows_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 5, 4, 16)), jnp.float32)
    q, s = quantize_kv_rows(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x)).max()
    assert err <= np.abs(np.asarray(x)).max() / 127 + 1e-6


def test_llama_kv_quant_decode_close_to_bf16_cache():
    """Full decoder forward: int8-cache decode steps stay numerically
    close to the bf16-cache path on the same inputs."""
    cfg = llama.LlamaConfig.tiny()
    qcfg = dataclasses.replace(cfg, kv_quant=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B, S, total = 2, 8, 16
    ids = jnp.asarray(rng.integers(5, 500, size=(B, S)), jnp.int32)
    lens = jnp.asarray([S, S - 2], jnp.int32)

    outs = {}
    for name, c in (("bf16", cfg), ("int8", qcfg)):
        cache = llama.init_kv_cache(c, B, total)
        pre = llama.forward(
            params, c, input_ids=ids, kv_lens=lens, kv_cache=cache,
        )
        # one decode step at each sample's own position
        tok = jnp.asarray([[7], [9]], jnp.int32)
        step = llama.forward(
            params, c,
            input_ids=tok,
            positions=lens[:, None],
            kv_lens=lens + 1,
            kv_cache=pre["kv_cache"],
            write_pos=lens,
        )
        outs[name] = (
            np.asarray(pre["logits"]), np.asarray(step["logits"]),
        )
    for a, b in zip(outs["bf16"], outs["int8"]):
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.05


def test_kv_quant_generate_on_tp_mesh_matches_single_device():
    """int8-KV generate under a dp/tp mesh reproduces the single-device
    int8-KV greedy decode exactly (the quantized cache arrays flow
    through the while-loop carry with SPMD shardings)."""
    from ullava_tpu.models import generate as gen_mod
    from ullava_tpu.models import ullava_core
    from ullava_tpu.parallel import MeshConfig, make_mesh
    from ullava_tpu.parallel.sharding import shard_params

    core = ullava_core.UllavaCoreConfig.tiny()
    cfg = dataclasses.replace(
        core, llm=dataclasses.replace(core.llm, kv_quant=True)
    )
    params = {"core": ullava_core.init_params(jax.random.PRNGKey(5), cfg)}
    gen = gen_mod.GenerateConfig(max_new_tokens=4, temperature=0.0)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(5, 100, size=(2, 10)), jnp.int32)
    lens = jnp.asarray([10, 7], jnp.int32)

    ref = gen_mod.generate(
        params["core"], cfg, gen, input_ids=ids, prompt_lens=lens
    )
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=4))
    sharded = shard_params(params, mesh)["core"]
    out = gen_mod.make_generate_fn(cfg, gen)(sharded, ids, lens)
    np.testing.assert_array_equal(
        np.asarray(out["sequences"]), np.asarray(ref["sequences"])
    )


def test_decode_kernel_bf16_inputs_match_fp32_reference():
    """Serving dtype (bf16 q) parity: the kernel's score scaling runs in
    fp32 (folded into the key-scale multiply), so bf16 inputs only carry
    the bf16 representation error of q itself."""
    rng = np.random.default_rng(4)
    q, kq, vq, ks, vs, lens = _rand_case(rng, S=128)
    qb = q.astype(jnp.bfloat16)
    scale = 128**-0.5
    layer = jnp.int32(0)
    ref = decode_attention_int8_xla(
        qb.astype(jnp.float32), kq, vq, ks, vs, lens, layer, scale=scale
    )
    got = decode_attention_int8(
        qb, kq, vq, ks, vs, lens, layer, scale=scale, block_b=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.04, rtol=0.04
    )


def test_llama_gqa_kv_quant_decode():
    """GQA (num_kv_heads < num_heads) + kv_quant routes through the XLA
    fallback, whose cache reshape must use Hkv (not q's head count)."""
    cfg = llama.LlamaConfig.tiny(num_heads=4, num_kv_heads=2)
    qcfg = dataclasses.replace(cfg, kv_quant=True)
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(5)
    B, S, total = 2, 8, 16
    ids = jnp.asarray(rng.integers(5, 500, size=(B, S)), jnp.int32)
    lens = jnp.asarray([S, S - 3], jnp.int32)

    outs = {}
    for name, c in (("bf16", cfg), ("int8", qcfg)):
        cache = llama.init_kv_cache(c, B, total)
        pre = llama.forward(params, c, input_ids=ids, kv_lens=lens, kv_cache=cache)
        tok = jnp.asarray([[7], [9]], jnp.int32)
        step = llama.forward(
            params, c, input_ids=tok, positions=lens[:, None],
            kv_lens=lens + 1, kv_cache=pre["kv_cache"], write_pos=lens,
        )
        outs[name] = (np.asarray(pre["logits"]), np.asarray(step["logits"]))
    for a, b in zip(outs["bf16"], outs["int8"]):
        denom = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / denom < 0.05


def test_prefill_quantize_write_matches_xla():
    """Fused prefill quantize-and-write parity: int8 rows and scales are
    bit-identical to quantize_kv_rows + dynamic_update_slice, and other
    layers / positions >= S stay untouched."""
    from ullava_tpu.ops.decode_attention import prefill_quantize_write

    rng = np.random.default_rng(9)
    L, B, S, maxS, Hkv, hd = 3, 2, 24, 40, 2, 128
    C = Hkv * hd
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, hd)), jnp.float32)
    # Pre-populated cache (sentinel content that must survive).
    ck0 = jnp.asarray(rng.integers(-100, 100, (L, B, maxS, C)), jnp.int8)
    cv0 = jnp.asarray(rng.integers(-100, 100, (L, B, maxS, C)), jnp.int8)
    ks0 = jnp.asarray(rng.standard_normal((L, B, maxS, Hkv)), jnp.float32)
    vs0 = jnp.asarray(rng.standard_normal((L, B, maxS, Hkv)), jnp.float32)
    layer = jnp.int32(1)

    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    idx = (layer, jnp.int32(0), jnp.int32(0), jnp.int32(0))
    rk = jax.lax.dynamic_update_slice(ck0, kq.reshape(B, S, C)[None], idx)
    rv = jax.lax.dynamic_update_slice(cv0, vq.reshape(B, S, C)[None], idx)
    rks = jax.lax.dynamic_update_slice(ks0, ks[None], idx)
    rvs = jax.lax.dynamic_update_slice(vs0, vs[None], idx)

    ck, cv, cks, cvs = prefill_quantize_write(
        k, v, ck0, cv0, ks0, vs0, layer, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(cks), np.asarray(rks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cvs), np.asarray(rvs), rtol=1e-6)


def test_prefill_quantize_write_bf16_inputs():
    """bf16 serving dtype: the kernel upcasts in VMEM exactly like the XLA
    path upcasts in HBM — rows must still match bit-for-bit."""
    from ullava_tpu.ops.decode_attention import prefill_quantize_write

    rng = np.random.default_rng(10)
    L, B, S, maxS, Hkv, hd = 2, 1, 16, 16, 2, 128
    C = Hkv * hd
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, hd)), jnp.bfloat16)
    ck0 = jnp.zeros((L, B, maxS, C), jnp.int8)
    cv0 = jnp.zeros((L, B, maxS, C), jnp.int8)
    ks0 = jnp.zeros((L, B, maxS, Hkv), jnp.float32)
    vs0 = jnp.zeros((L, B, maxS, Hkv), jnp.float32)
    layer = jnp.int32(0)
    kq, ks = quantize_kv_rows(k)
    ck, cv, cks, cvs = prefill_quantize_write(
        k, v, ck0, cv0, ks0, vs0, layer, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ck[0, :, :S]), np.asarray(kq.reshape(B, S, C))
    )
    np.testing.assert_allclose(np.asarray(cks[0, :, :S]), np.asarray(ks),
                               rtol=1e-6)


def test_kv_quant_cache_shapes():
    cfg = dataclasses.replace(llama.LlamaConfig.tiny(), kv_quant=True)
    cache = llama.init_kv_cache(cfg, 2, 32)
    assert cache["k"].dtype == jnp.int8
    assert cache["k_scale"].shape == (cfg.num_layers, 2, 32, cfg.num_kv_heads)


def _gqa_xla_ref(q, kq, vq, ks, vs, lens, layer, scale):
    """Dequantize the GQA cache and attend with the plain XLA reference."""
    from ullava_tpu.ops.attention import attention_xla

    L, B, S, Ckv = kq.shape
    Hkv = ks.shape[-1]
    hd = Ckv // Hkv
    kf = kq[layer].astype(jnp.float32).reshape(B, S, Hkv, hd) * ks[layer][..., None]
    vf = vq[layer].astype(jnp.float32).reshape(B, S, Hkv, hd) * vs[layer][..., None]
    return attention_xla(q, kf, vf, kv_lens=lens, scale=scale)


def test_decode_kernel_gqa_matches_reference():
    """Grouped-KV (Hkv < H) attend-only kernel == dequant + XLA attention."""
    rng = np.random.default_rng(11)
    L, B, S, H, Hkv, hd = 2, 2, 128, 8, 2, 128
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, S, Hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, S, Hkv, hd)), jnp.float32)
    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    kq = kq.reshape(L, B, S, Hkv * hd)
    vq = vq.reshape(L, B, S, Hkv * hd)
    lens = jnp.asarray([S, S // 2 + 5], jnp.int32)
    layer = jnp.int32(1)
    scale = hd**-0.5
    ref = _gqa_xla_ref(q, kq, vq, ks, vs, lens, layer, scale)
    got = decode_attention_int8(
        q, kq, vq, ks, vs, lens, layer, scale=scale, block_b=2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, 0], np.asarray(ref)[:, 0], atol=3e-5
    )


def test_fused_write_kernel_gqa():
    """Grouped-KV write-and-attend: output and cache writes match the
    scatter + dequant-attend reference."""
    rng = np.random.default_rng(12)
    L, B, S, H, Hkv, hd = 2, 2, 64, 4, 2, 128
    Ckv = Hkv * hd
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    hist = jnp.asarray(rng.standard_normal((L, B, S, Hkv, hd)), jnp.float32)
    kq0, ks0 = quantize_kv_rows(hist)
    vq0, vs0 = quantize_kv_rows(hist[::-1])
    cache_k = kq0.reshape(L, B, S, Ckv)
    cache_v = vq0.reshape(L, B, S, Ckv)
    write_pos = jnp.asarray([S // 2, 9], jnp.int32)
    lens = write_pos + 1
    layer = jnp.int32(0)
    scale = hd**-0.5
    k_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, Hkv, hd)), jnp.float32)
    kqn, ksn = quantize_kv_rows(k_new)
    vqn, vsn = quantize_kv_rows(v_new)

    b_idx = jnp.arange(B)
    rk = cache_k.at[layer, b_idx, write_pos].set(kqn.reshape(B, Ckv))
    rv = cache_v.at[layer, b_idx, write_pos].set(vqn.reshape(B, Ckv))
    rks = ks0.at[layer, b_idx, write_pos].set(ksn)
    rvs = vs0.at[layer, b_idx, write_pos].set(vsn)
    ref = _gqa_xla_ref(q, rk, rv, rks, rvs, lens, layer, scale)

    attn, ck, cv, cks, cvs = decode_attention_int8_fused_write(
        q, kqn.reshape(B, Ckv), ksn, vqn.reshape(B, Ckv), vsn,
        cache_k, cache_v, ks0, vs0, write_pos, layer,
        scale=scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(attn)[:, 0], np.asarray(ref)[:, 0], atol=3e-5
    )
    np.testing.assert_array_equal(np.asarray(ck), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(rv))
    np.testing.assert_allclose(np.asarray(cks), np.asarray(rks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cvs), np.asarray(rvs), rtol=1e-6)
