"""Bench knob-combination matrix (round-3 verdict item 8).

`bench.py` exposes ~12 BENCH_* env knobs. Each default was measured and
individually tested in earlier rounds, but knob COMBINATIONS were never
exercised together. This module enumerates the supported serving/training
combinations on tiny shapes and checks every combo (a) builds and runs
the code path `bench.build_res` would select for it and (b) stays within
serving tolerance of the all-default path.

Knob -> config mapping (bench.py `build_res` / `build`):
  BENCH_LLM_A8   -> LlamaConfig.a8_prefill
  BENCH_KV8      -> LlamaConfig.kv_quant
  BENCH_ROPE_F32 -> LlamaConfig.rope_f32
  BENCH_LLM_ATTN -> LlamaConfig.attn_impl          (auto/xla on CPU)
  BENCH_W8A8     -> SamVisionConfig.mlp_w8a8
  BENCH_ATTN_A8  -> SamVisionConfig.attn_w8a8
  BENCH_FUSED_CE -> UllavaCoreConfig.fused_ce      (stage-1 loss)
  BENCH_PACKED   -> pack_sam_attention weights (parity covered by
                    test_sam.test_packed_*; off by default, excluded here
                    because it is a weight-layout transform, not a config
                    bit that composes with the others)
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.models import generate as gen_mod
from ullava_tpu.models import ullava_core
from ullava_tpu.ops import quant

LLM_COMBOS = list(itertools.product((False, True), repeat=3))


@pytest.fixture(scope="module")
def llm_fixture():
    core = ullava_core.UllavaCoreConfig.tiny()
    params = ullava_core.init_params(jax.random.PRNGKey(11), core)
    # int8 llm weights, as bench.build_res quantizes them
    params["llm"] = quant.quantize_tree(
        params["llm"], quant.LLAMA_QUANT_KEYS
    )
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(5, 140, size=(2, 12)), jnp.int32)
    lens = jnp.asarray([12, 9], jnp.int32)
    gen = gen_mod.GenerateConfig(max_new_tokens=4, temperature=0.0)

    def run(core_cfg):
        out = gen_mod.generate(
            params, core_cfg, gen, input_ids=ids, prompt_lens=lens
        )
        return (
            np.asarray(out["sequences"]),
            np.asarray(out["hidden_last"], np.float32),
        )

    ref_seq, ref_hidden = run(core)
    return core, run, ref_seq, ref_hidden


@pytest.mark.parametrize("a8,kv8,ropef32", LLM_COMBOS)
def test_llm_knob_combinations(llm_fixture, a8, kv8, ropef32):
    """Every (BENCH_LLM_A8, BENCH_KV8, BENCH_ROPE_F32) combination decodes
    and stays within serving tolerance of the all-default path."""
    core, run, ref_seq, ref_hidden = llm_fixture
    cfg = dataclasses.replace(
        core,
        llm=dataclasses.replace(
            core.llm, a8_prefill=a8, kv_quant=kv8, rope_f32=ropef32
        ),
    )
    seq, hidden = run(cfg)
    assert seq.shape == ref_seq.shape
    assert np.isfinite(hidden).all()
    denom = np.abs(ref_hidden).mean() + 1e-6
    assert np.abs(hidden - ref_hidden).mean() / denom < 0.15
    if not a8 and not kv8:
        # rope_f32 alone is a precision knob: greedy tokens must agree
        # with the default path on tiny shapes.
        np.testing.assert_array_equal(seq, ref_seq)


SAM_COMBOS = [
    (mlp, attn, layout)
    for mlp in (False, True)
    for attn in (False, True)
    for layout in ("auto", "block")
]


@pytest.fixture(scope="module")
def sam_fixture():
    from ullava_tpu.models.sam import image_encoder as ie

    cfg = ie.SamVisionConfig.tiny(window_size=3, global_attn_indexes=(1, 3))
    params = ie.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    for k in ("rel_pos_h", "rel_pos_w"):
        for blk in ("window_blocks", "global_blocks"):
            params[blk][k] = jnp.asarray(
                0.1 * rng.standard_normal(params[blk][k].shape), jnp.float32
            )
    qparams = quant.quantize_tree(params, quant.SAM_ENCODER_QUANT_KEYS)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    ref = np.asarray(
        ie.encode(qparams, dataclasses.replace(cfg, attn_kernel="xla"), img)
    )
    return ie, cfg, qparams, img, ref


@pytest.mark.parametrize("mlp_w8a8,attn_w8a8,layout", SAM_COMBOS)
def test_sam_knob_combinations(sam_fixture, mlp_w8a8, attn_w8a8, layout):
    """Every (BENCH_W8A8, BENCH_ATTN_A8, window_layout) combination of the
    SAM serving encoder runs the Pallas path and stays within serving
    tolerance of the unfused XLA path on the same int8 weights."""
    ie, cfg, qparams, img, ref = sam_fixture
    c = dataclasses.replace(
        cfg,
        attn_kernel="pallas_interpret",
        mlp_w8a8=mlp_w8a8,
        attn_w8a8=attn_w8a8,
        window_layout=layout,
    )
    got = np.asarray(ie.encode(qparams, c, img))
    assert np.isfinite(got).all()
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.1


@pytest.mark.parametrize("a8,attn", [
    (False, "xla"), (True, "xla"),
    (False, "flash_interpret"), (True, "flash_interpret"),
])
def test_clip_knob_combinations(a8, attn):
    """Every (BENCH_CLIP_A8, BENCH_CLIP_ATTN) combination of the CLIP
    serving tower runs and stays within serving tolerance of the plain
    path (flash_interpret exercises the padded masked-flash path the TPU
    takes at S=257 -> 264; the a8 path is TPU-gated, so on CPU it must be
    a bitwise no-op)."""
    from ullava_tpu.models import clip_vit

    # S = 1+9 = 10 % 8 != 0 (exercises the pad), lanes 4*32 = 128
    # (clears the flash lane gate the 224-pt config meets via 16*64).
    cfg = clip_vit.CLIPVisionConfig.tiny(image_size=42, hidden_size=128)
    params = clip_vit.init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 42, 42, 3)), jnp.float32)
    ref = np.asarray(
        clip_vit.forward(params, cfg, x, hidden_layer=-2)["patch_features"]
    )
    c = dataclasses.replace(cfg, a8=a8, attn_impl=attn)
    got = np.asarray(
        clip_vit.forward(params, c, x, hidden_layer=-2)["patch_features"]
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("fused_ce", (False, True))
def test_fused_ce_knob(fused_ce):
    """BENCH_FUSED_CE: streamed-vocab CE == full-logit CE on the stage-1
    training loss (composes with the serving knobs only through the
    shared llm config, but both settings must stay loss-identical)."""
    core = ullava_core.UllavaCoreConfig.tiny(fused_ce=fused_ce)
    params = ullava_core.init_params(jax.random.PRNGKey(3), core)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(5, 140, size=(2, 10)), jnp.int32)
    labels = jnp.asarray(rng.integers(5, 140, size=(2, 10)), jnp.int32)
    out = ullava_core.forward(params, core, input_ids=ids, labels=labels)
    assert np.isfinite(float(out["loss"]))
    ref = ullava_core.forward(
        params,
        dataclasses.replace(core, fused_ce=False),
        input_ids=ids,
        labels=labels,
    )
    np.testing.assert_allclose(
        float(out["loss"]), float(ref["loss"]), rtol=2e-5
    )
