"""SAM parity vs HF SamModel (tiny random weights) + shape/geometry tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.models.sam import (
    SamConfig,
    dense_positional_embedding,
    encode_prompts,
    decode_masks,
    encode_sam_image,
    init_sam_params,
    sam_vit_h,
)
from ullava_tpu.models.sam.build import forward_masks, preprocess, upscale_masks_to_frame
from ullava_tpu.models.sam.convert import convert_sam, normalize_sam_keys
from ullava_tpu.models.weights import torch_module_state_dict


@pytest.fixture(scope="module")
def tiny_pair():
    torch = pytest.importorskip("torch")
    from transformers import SamConfig as HFSamConfig
    from transformers import SamModel

    hf_cfg = HFSamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
            image_size=64, patch_size=16, window_size=2, global_attn_indexes=[1, 3],
            output_channels=16, mlp_dim=128, attn_implementation="eager",
            # HF sizes its random-Fourier PE from vision_config.num_pos_feats;
            # keep it consistent with the prompt hidden size (16 -> 8).
            num_pos_feats=8,
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_embedding_size=4, image_size=64, mask_input_channels=4
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=16
        ),
    )
    torch.manual_seed(0)
    hf = SamModel(hf_cfg).eval()
    sd = torch_module_state_dict(hf)

    cfg = SamConfig.tiny()
    params = convert_sam(sd, cfg, dtype=jnp.float32)
    return hf, cfg, params


def test_normalize_keys_covers_all(tiny_pair):
    hf, cfg, params = tiny_pair
    sd = normalize_sam_keys(torch_module_state_dict(hf))
    assert any(k.startswith("image_encoder.blocks.0.attn.qkv") for k in sd)
    assert "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix" in sd
    assert "mask_decoder.output_upscaling.0.weight" in sd
    assert "mask_decoder.iou_prediction_head.layers.2.weight" in sd


def test_image_encoder_parity(tiny_pair):
    torch = pytest.importorskip("torch")
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        ref = hf.vision_encoder(torch.tensor(img)).last_hidden_state.numpy()  # [B,C,g,g]

    out = encode_sam_image(
        params["image_encoder"], cfg.vision, jnp.asarray(img.transpose(0, 2, 3, 1))
    )  # [B,g,g,C]
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=5e-4, rtol=5e-4
    )


def test_dense_pe_parity(tiny_pair):
    torch = pytest.importorskip("torch")
    hf, cfg, params = tiny_pair
    with torch.no_grad():
        ref = hf.get_image_wide_positional_embeddings().numpy()[0]  # [D,g,g]
    pe = dense_positional_embedding(params["prompt_encoder"], cfg.prompt)  # [g,g,D]
    np.testing.assert_allclose(np.asarray(pe).transpose(2, 0, 1), ref, atol=1e-4)


def test_prompt_encoder_points_parity(tiny_pair):
    torch = pytest.importorskip("torch")
    hf, cfg, params = tiny_pair
    pts = np.array([[[[10.0, 20.0], [40.0, 5.0]]]], dtype=np.float32)  # [1,1,2,2]
    labels = np.array([[[1, 0]]], dtype=np.int64)

    with torch.no_grad():
        sparse_ref, dense_ref = hf.prompt_encoder(
            input_points=torch.tensor(pts),
            input_labels=torch.tensor(labels),
            input_boxes=None,
            input_masks=None,
        )
    sparse, dense = encode_prompts(
        params["prompt_encoder"], cfg.prompt, batch=1,
        points=(jnp.asarray(pts[:, 0]), jnp.asarray(labels[:, 0].astype(np.int32))),
    )
    np.testing.assert_allclose(
        np.asarray(sparse), sparse_ref.numpy().reshape(1, -1, 16), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dense).transpose(0, 3, 1, 2), dense_ref.detach().numpy(), atol=1e-5
    )


def test_mask_decoder_parity(tiny_pair):
    torch = pytest.importorskip("torch")
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    B, g, D = 1, 4, 16
    img_emb = rng.standard_normal((B, D, g, g)).astype(np.float32)
    sparse = rng.standard_normal((B, 1, 2, D)).astype(np.float32)
    dense = rng.standard_normal((B, D, g, g)).astype(np.float32)

    with torch.no_grad():
        image_pe = hf.get_image_wide_positional_embeddings()
        low_ref, iou_ref = hf.mask_decoder(
            image_embeddings=torch.tensor(img_emb),
            image_positional_embeddings=image_pe,
            sparse_prompt_embeddings=torch.tensor(sparse),
            dense_prompt_embeddings=torch.tensor(dense),
            multimask_output=False,
        )

    pe = dense_positional_embedding(params["prompt_encoder"], cfg.prompt)
    low, iou = decode_masks(
        params["mask_decoder"], cfg.decoder,
        jnp.asarray(img_emb.transpose(0, 2, 3, 1)), pe,
        jnp.asarray(sparse[:, 0]), jnp.asarray(dense.transpose(0, 2, 3, 1)),
        multimask_output=False,
    )
    np.testing.assert_allclose(
        np.asarray(low), low_ref.numpy()[:, 0], atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(iou), iou_ref.numpy()[:, 0], atol=5e-4, rtol=5e-4
    )


def test_text_prompt_pipeline_shapes(tiny_pair):
    """The u-LLaVA [SEG] path: text embeds -> per-embed masks."""
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(2)
    B, N = 2, 3
    img = jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32)
    emb = encode_sam_image(params["image_encoder"], cfg.vision, img)
    text = jnp.asarray(rng.standard_normal((B, N, 16)), jnp.float32)
    low, iou = forward_masks(params, cfg, emb, text)
    assert low.shape == (B, N, 16, 16)
    assert iou.shape == (B, N)
    # Each text embedding must produce its own (independent) mask.
    low_single, _ = forward_masks(params, cfg, emb, text[:, :1])
    np.testing.assert_allclose(
        np.asarray(low[:, 0]), np.asarray(low_single[:, 0]), atol=1e-5
    )


def test_preprocess_and_frame_upscale():
    img = jnp.ones((1, 48, 64, 3), jnp.float32) * 128
    out = preprocess(img, img_size=64)
    assert out.shape == (1, 64, 64, 3)
    # Padded area is exactly the normalized zero.
    np.testing.assert_allclose(np.asarray(out[0, 50, 0]), 0.0, atol=1e-6)
    masks = jnp.zeros((1, 2, 16, 16))
    up = upscale_masks_to_frame(masks, img_size=64)
    assert up.shape == (1, 2, 64, 64)


def test_vit_h_grouping():
    cfg = sam_vit_h()
    cfg.vision.validate_grouping()
    assert cfg.vision.group_period == 8
    params = init_sam_params(jax.random.PRNGKey(0), SamConfig.tiny())
    assert params["image_encoder"]["window_blocks"]["qkv"].shape[0] == 2  # 4 layers, 2 global


def test_int8_quantized_towers_close_to_fp(tiny_pair):
    """Weight-only int8 on the frozen towers stays numerically close."""
    from ullava_tpu.ops import quant

    _, cfg, params = tiny_pair
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)

    ref = np.asarray(encode_sam_image(params["image_encoder"], cfg.vision, img))
    qparams = quant.quantize_tree(
        params["image_encoder"], quant.SAM_ENCODER_QUANT_KEYS
    )
    assert quant.is_quantized(qparams["window_blocks"]["qkv"])
    got = np.asarray(encode_sam_image(qparams, cfg.vision, img))
    # relative error small (random tiny weights; production impact is
    # validated at metric level)
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.1


def test_attn_w8a8_encoder_close_to_weight_only():
    """Serving knob: int8-activation attention projections stay close to
    the weight-only int8 encoder output. Uses random init weights (the HF
    tiny fixture's qkv weights are near-zero, which would make the two
    paths trivially identical)."""
    import dataclasses

    from ullava_tpu.models.sam import image_encoder as ie
    from ullava_tpu.ops import quant

    cfg = ie.SamVisionConfig.tiny()
    params = ie.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    qparams = quant.quantize_tree(params, quant.SAM_ENCODER_QUANT_KEYS)
    ref = np.asarray(ie.encode(qparams, cfg, img))
    got = np.asarray(
        ie.encode(qparams, dataclasses.replace(cfg, attn_w8a8=True), img)
    )
    assert not np.array_equal(got, ref)  # the knob actually changed the path
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.1


def test_quant_roundtrip_exactness():
    from ullava_tpu.ops import quant

    w = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8)), jnp.float32)
    q = quant.quantize_int8(w)
    deq = np.asarray(quant.dequantize(q, jnp.float32))
    assert np.abs(deq - np.asarray(w)).max() < np.abs(np.asarray(w)).max() / 100
    x = jnp.ones((2, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(quant.apply_linear(x, q)), np.asarray(x @ deq), atol=1e-3
    )


def test_pallas_window_attention_matches_xla(tiny_pair):
    """Fused rel-pos kernel (interpret mode) == XLA reference path."""
    import dataclasses

    _, cfg, params = tiny_pair
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    ref = encode_sam_image(params["image_encoder"], cfg.vision, img)
    cfg_k = dataclasses.replace(cfg.vision, attn_kernel="pallas_interpret")
    got = encode_sam_image(params["image_encoder"], cfg_k, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pallas_kernel_direct_parity_window14():
    """Kernel-level parity at the production window size (14, hd 80)."""
    from ullava_tpu.ops.sam_attention import (
        decomposed_bias_terms,
        fused_window_attention,
    )
    from ullava_tpu.models.sam.image_encoder import rel_pos_bias
    from ullava_tpu.ops.attention import attention_xla

    rng = np.random.default_rng(12)
    B, H, W, hd = 1, 2, 14, 80
    S = W * W
    q = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    Rh = jnp.asarray(0.1 * rng.standard_normal((2 * W - 1, hd)), jnp.float32)
    Rw = jnp.asarray(0.1 * rng.standard_normal((2 * W - 1, hd)), jnp.float32)

    q_grid = q.transpose(0, 2, 1, 3).reshape(B, H, W, W, hd)
    bias = rel_pos_bias(q_grid, Rh, Rw, W)
    ref = attention_xla(q, k, v, bias=bias, scale=hd**-0.5)

    A, Bb = decomposed_bias_terms(q_grid, Rh, Rw, W)
    N = B * H
    got = fused_window_attention(
        q.transpose(0, 2, 1, 3).reshape(N, S, hd),
        k.transpose(0, 2, 1, 3).reshape(N, S, hd),
        v.transpose(0, 2, 1, 3).reshape(N, S, hd),
        A.reshape(N, S, W), Bb.reshape(N, S, W),
        window=W, scale=hd**-0.5, interpret=True,
    ).reshape(B, H, S, hd).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_pallas_global_attention_tiled_parity():
    """Tiled flash variant with per-tile decomposed bias == XLA path."""
    from ullava_tpu.ops.sam_attention import (
        decomposed_bias_terms,
        fused_global_attention,
    )
    from ullava_tpu.models.sam.image_encoder import rel_pos_bias
    from ullava_tpu.ops.attention import attention_xla

    rng = np.random.default_rng(13)
    B, H, W, hd = 1, 2, 16, 64  # S = 256, tiles of 128 -> 2x2 k/q tiling
    S = W * W
    q = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    Rh = jnp.asarray(0.1 * rng.standard_normal((2 * W - 1, hd)), jnp.float32)
    Rw = jnp.asarray(0.1 * rng.standard_normal((2 * W - 1, hd)), jnp.float32)

    q_grid = q.transpose(0, 2, 1, 3).reshape(B, H, W, W, hd)
    bias = rel_pos_bias(q_grid, Rh, Rw, W)
    ref = attention_xla(q, k, v, bias=bias, scale=hd**-0.5)

    A, Bb = decomposed_bias_terms(q_grid, Rh, Rw, W)
    N = B * H
    got = fused_global_attention(
        q.transpose(0, 2, 1, 3).reshape(N, S, hd),
        k.transpose(0, 2, 1, 3).reshape(N, S, hd),
        v.transpose(0, 2, 1, 3).reshape(N, S, hd),
        A.reshape(N, S, W), Bb.reshape(N, S, W),
        window=W, scale=hd**-0.5, block_q=128, block_k=128, interpret=True,
    ).reshape(B, H, S, hd).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4)


def test_pallas_global_attention_y_parity():
    """Lane-sliced global kernel (raw [B,S,3C] qkv input, natural-layout
    bias, grouped heads) == XLA path, across q/k tiling and both exp
    modes."""
    from ullava_tpu.ops.sam_attention import fused_global_attention_y
    from ullava_tpu.models.sam.image_encoder import rel_pos_bias
    from ullava_tpu.ops.attention import attention_xla

    rng = np.random.default_rng(17)
    B, H, W, hd = 2, 4, 16, 32  # hg*hd: 4*32 = 128 lanes; S = 256
    S, C = W * W, H * hd
    q = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, hd)), jnp.float32)
    Rh = jnp.asarray(0.1 * rng.standard_normal((2 * W - 1, hd)), jnp.float32)
    Rw = jnp.asarray(0.1 * rng.standard_normal((2 * W - 1, hd)), jnp.float32)

    q_grid = q.transpose(0, 2, 1, 3).reshape(B, H, W, W, hd)
    bias = rel_pos_bias(q_grid, Rh, Rw, W)
    ref = attention_xla(q, k, v, bias=bias, scale=hd**-0.5)  # [B,S,H,hd]
    ref = ref.reshape(B, S, C)

    # y = raw qkv projection output: [B, S, 3C] with (q|k|v) lane sections.
    y = jnp.concatenate(
        [q.reshape(B, S, C), k.reshape(B, S, C), v.reshape(B, S, C)], axis=-1
    )
    # Natural-layout bias terms, pre-scaled by 1/scale (inv = hd**0.5).
    inv = float(hd**0.5)
    coords = jnp.arange(W)
    rel = coords[:, None] - coords[None, :] + (W - 1)
    RhG = Rh[rel] * inv  # [i, a, hd]
    RwG = Rw[rel] * inv
    q5 = q.reshape(B, W, W, H, hd)
    A = jnp.einsum("nijhc,iac->nijha", q5, RhG).reshape(B, S, H, W)
    Bb = jnp.einsum("nijhc,jbc->nijhb", q5, RwG).reshape(B, S, H, W)

    for hg, bq, bk in [(4, 128, 128), (4, 256, 128), (4, 128, 256)]:
        got = fused_global_attention_y(
            y, A, Bb, num_heads=H, head_dim=hd, window=W, scale=hd**-0.5,
            block_q=bq, block_k=bk, head_group=hg, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
        )
    # bf16-exp serving mode: probability mantissa only (~2^-8 relative).
    got16 = fused_global_attention_y(
        y, A, Bb, num_heads=H, head_dim=hd, window=W, scale=hd**-0.5,
        block_q=128, block_k=128, exp_bf16=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got16), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
    # int8 score-dot serving mode: per-row quantization noise on the
    # logits (~1% relative) shifts probabilities slightly; the av dot
    # stays bf16, so outputs track the reference within a few percent.
    got_i8 = fused_global_attention_y(
        y, A, Bb, num_heads=H, head_dim=hd, window=W, scale=hd**-0.5,
        block_q=128, block_k=128, exp_bf16=True, dots_i8=True,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_i8), np.asarray(ref), atol=5e-2, rtol=5e-2
    )
    # The probability shift must stay small in aggregate too.
    rms = float(jnp.sqrt(jnp.mean((got_i8 - ref) ** 2)))
    ref_rms = float(jnp.sqrt(jnp.mean(ref**2)))
    assert rms < 0.02 * ref_rms, (rms, ref_rms)


def test_packed_attention_weights_match_unpacked():
    """pack_sam_attention (head-major, 128-lane-padded qkv/proj) must be a
    pure relayout: encode output identical to the unpacked XLA path."""
    import dataclasses

    from ullava_tpu.models.sam import image_encoder as ie
    from ullava_tpu.ops import quant

    cfg = ie.SamVisionConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        out_chans=32, window_size=2, global_attn_indexes=(0, 1),
        dtype=jnp.float32, attn_kernel="xla",
    )
    rng = jax.random.PRNGKey(3)
    p = ie.init_params(rng, cfg)
    for blocks in ("window_blocks", "global_blocks"):
        for k in ("rel_pos_h", "rel_pos_w"):
            p[blocks][k] = 0.2 * jax.random.normal(
                jax.random.fold_in(rng, hash(blocks + k) % 1000),
                p[blocks][k].shape, jnp.float32,
            )
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 64, 3), jnp.float32)
    ref = ie.encode(p, cfg, x)

    # pad head_dim 16 -> 32 to exercise the packed layout on CPU
    packed = ie.pack_sam_attention(p, cfg, head_pad=32)
    out = ie.encode(packed, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=1e-5)

    # quantized weights pack too
    qp = dict(p)
    qp["window_blocks"] = quant.quantize_tree(
        p["window_blocks"], quant.SAM_ENCODER_QUANT_KEYS
    )
    qp["global_blocks"] = quant.quantize_tree(
        p["global_blocks"], quant.SAM_ENCODER_QUANT_KEYS
    )
    ref_q = ie.encode(qp, cfg, x)
    out_q = ie.encode(ie.pack_sam_attention(qp, cfg, head_pad=32), cfg, x)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q), rtol=0, atol=1e-5)


def test_packed_kernels_interpret_match_fallback():
    """Packed Pallas kernels (interpret mode) == the packed XLA fallback."""
    import dataclasses

    from ullava_tpu.models.sam import image_encoder as ie

    cfg = ie.SamVisionConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        out_chans=32, window_size=2, global_attn_indexes=(0, 1),
        dtype=jnp.float32, attn_kernel="xla",
    )
    p = ie.init_params(jax.random.PRNGKey(3), cfg)
    for blocks in ("window_blocks", "global_blocks"):
        for k in ("rel_pos_h", "rel_pos_w"):
            p[blocks][k] = 0.2 * jax.random.normal(
                jax.random.PRNGKey(hash(blocks + k) % 1000),
                p[blocks][k].shape, jnp.float32,
            )
    packed = ie.pack_sam_attention(p, cfg, head_pad=32)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 64, 3), jnp.float32)
    ref = ie.encode(packed, cfg, x)
    cfg_k = dataclasses.replace(cfg, attn_kernel="pallas_interpret")
    out = ie.encode(packed, cfg_k, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=1e-4)


def test_resident_layout_roundtrip():
    """_partition_resident / _unpartition_resident invert each other,
    including the boundary classes (grid 7, window 3 -> rem 1)."""
    from ullava_tpu.models.sam.image_encoder import (
        _partition_resident,
        _unpartition_resident,
    )

    rng = np.random.default_rng(0)
    for g, ws in [(7, 3), (4, 2), (8, 3)]:
        x = jnp.asarray(rng.standard_normal((2, g, g, 5)), jnp.float32)
        cls = _partition_resident(x, ws)
        back = _unpartition_resident(cls, 2, g, ws)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_resident_window_layout_matches_xla_boundary():
    """The compact resident window-major path (grid % window != 0: full +
    right/bottom/corner classes with analytic pad keys) == the reference
    per-block zero-pad XLA path. Grid 4, window 3 -> 1 full (3x3),
    1 right (3x1), 1 bottom (1x3), 1 corner (1x1) window per image."""
    import dataclasses

    from ullava_tpu.models.sam import image_encoder as ie

    cfg = ie.SamVisionConfig.tiny(window_size=3, global_attn_indexes=(1, 3))
    params = ie.init_params(jax.random.PRNGKey(0), cfg)
    # Randomize rel-pos tables so the decomposed-bias path is exercised.
    rng = np.random.default_rng(3)
    for k in ("rel_pos_h", "rel_pos_w"):
        for blk in ("window_blocks", "global_blocks"):
            params[blk][k] = jnp.asarray(
                0.1 * rng.standard_normal(params[blk][k].shape), jnp.float32
            )
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    ref = ie.encode(params, dataclasses.replace(cfg, attn_kernel="xla"), img)
    cfg_res = dataclasses.replace(
        cfg, attn_kernel="pallas_interpret", window_layout="resident"
    )
    got = ie.encode(params, cfg_res, img)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_global_fused_block_matches_xla():
    """The fused global-block serving path (LN1+qkv and proj+residual in
    the fused int8 kernels, S = 1024 tokens) == the unfused XLA path on
    the same quantized weights. Grid 32 (img 512) is the smallest size
    clearing the `_use_global_fused` gates (size > 16, S % 1024 == 0)."""
    import dataclasses

    from ullava_tpu.models.sam import image_encoder as ie
    from ullava_tpu.ops import quant

    cfg = ie.SamVisionConfig.tiny(
        img_size=512, embed_dim=128, num_heads=2, depth=2,
        window_size=2, global_attn_indexes=(1,), out_chans=32,
    )
    params = ie.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    for k in ("rel_pos_h", "rel_pos_w"):
        for blk in ("window_blocks", "global_blocks"):
            params[blk][k] = jnp.asarray(
                0.1 * rng.standard_normal(params[blk][k].shape), jnp.float32
            )
    qparams = quant.quantize_tree(params, quant.SAM_ENCODER_QUANT_KEYS)
    img = jnp.asarray(rng.standard_normal((1, 512, 512, 3)), jnp.float32)

    gb0 = jax.tree_util.tree_map(lambda a: a[0], qparams["global_blocks"])
    assert ie._use_global_fused(
        gb0, dataclasses.replace(cfg, attn_kernel="pallas_interpret"), cfg.grid
    )
    ref = ie.encode(qparams, dataclasses.replace(cfg, attn_kernel="xla"), img)
    got = ie.encode(
        qparams, dataclasses.replace(cfg, attn_kernel="pallas_interpret"), img
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-4
    )


def test_composite_bias_weights_match_standalone_terms():
    """`precompute_window_bias_weights` + the dual LN+qkv kernel == the
    standalone rel-pos bias matmuls on the resident window path (full +
    edge classes, grid 4 / window 3), within int8-composite tolerance.

    Reference computation: decomposed rel-pos bias,
    `/root/reference/models/segment_anything/modeling/image_encoder.py:321-393`."""
    import dataclasses

    from ullava_tpu.models.sam import image_encoder as ie
    from ullava_tpu.ops import quant

    cfg = ie.SamVisionConfig.tiny(window_size=3, global_attn_indexes=(1, 3))
    params = ie.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(7)
    for k in ("rel_pos_h", "rel_pos_w"):
        for blk in ("window_blocks", "global_blocks"):
            params[blk][k] = jnp.asarray(
                0.1 * rng.standard_normal(params[blk][k].shape), jnp.float32
            )
    # Non-zero qkv bias so the bq @ BD constant term is exercised.
    params["window_blocks"]["qkv_bias"] = jnp.asarray(
        0.1 * rng.standard_normal(params["window_blocks"]["qkv_bias"].shape),
        jnp.float32,
    )
    qparams = quant.quantize_tree(params, quant.SAM_ENCODER_QUANT_KEYS)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    cfg_res = dataclasses.replace(
        cfg, attn_kernel="pallas_interpret", window_layout="resident"
    )
    base = ie.encode(qparams, cfg_res, img)
    comp_params = dict(qparams)
    comp_params.update(
        ie.precompute_window_bias_weights(qparams, cfg)
    )
    assert "biasw" in comp_params["window_blocks"]
    got = ie.encode(comp_params, cfg_res, img)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), atol=5e-3, rtol=5e-3
    )
    # And against the reference-style XLA path (end-to-end semantics).
    ref = ie.encode(
        qparams, dataclasses.replace(cfg, attn_kernel="xla"), img
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-3, rtol=5e-3
    )


def test_stablehlo_export_roundtrip():
    """The StableHLO serving artifact (the reference ONNX wrapper's
    TPU-native counterpart, `/root/reference/models/segment_anything/
    utils/onnx.py`) serializes, deserializes, and reproduces the direct
    function to compile-path jitter (~1e-9), including the multi-click
    single-mask selection trick and the gated mask-prompt blend."""
    from ullava_tpu.models.sam import build as sam_build
    from ullava_tpu.models.sam import export as sam_export

    cfg = sam_build.SamConfig.tiny()
    params = sam_build.init_sam_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(11)
    B, N = 2, 3
    g = cfg.prompt.image_embedding_size
    D = cfg.prompt.embed_dim
    emb = jnp.asarray(rng.standard_normal((B, g, g, D)), jnp.float32)
    pts = jnp.asarray(
        rng.uniform(0, cfg.vision.img_size, (B, N, 2)), jnp.float32
    )
    labels = jnp.asarray([[1, 0, -1], [1, -1, -1]], jnp.int32)
    mask_in = jnp.asarray(
        rng.standard_normal((B, 4 * g, 4 * g, 1)), jnp.float32
    )
    has_mask = jnp.asarray([1.0, 0.0], jnp.float32)

    fn = sam_export.make_decoder_fn(params, cfg)
    want = fn(emb, pts, labels, mask_in, has_mask)

    blob = sam_export.export_sam_decoder(
        params, cfg, batch=B, num_points=N
    )
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    loaded = sam_export.load_sam_decoder(blob)
    got = loaded(emb, pts, labels, mask_in, has_mask)
    for w, g_ in zip(want, got):
        # Compile-path jitter only (different fusion choices through the
        # serialized module): ~1e-9 absolute.
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g_), atol=1e-6, rtol=1e-5
        )

    # Stability-score mode and all-mask mode build and run too.
    fn2 = sam_export.make_decoder_fn(
        params, cfg, return_single_mask=False, use_stability_score=True
    )
    masks2, scores2, low2 = fn2(emb, pts, labels, mask_in, has_mask)
    assert masks2.shape[1] == cfg.decoder.num_mask_tokens
    assert float(jnp.min(scores2)) >= 0.0
