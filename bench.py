"""North-star benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "mfu": ..., "phase_split": {...}, "secondary": {...}}

Presets (BENCH_PRESET):
- "res" (default): the BASELINE.json north-star metric — RefCOCO RES
  serving end to end on chip: SAM ViT-H encode (1024^2) + CLIP ViT-L +
  7B prefill + 32-token decode + [SEG] readout + SAM mask decode, int8
  weights. The reference publishes no RES throughput, so vs_baseline
  uses its only per-chip system datum (below) as the comparison point.
  The stage-1 training number rides along under "secondary"
  (BENCH_SECONDARY=0 to skip).
- "7b": stage-1 training throughput — CLIP ViT-L encode + projector +
  LLaMA-7B fwd/bwd, bf16, remat. Baseline: the reference's only published
  system-performance datum — ~6 h/epoch over 595K samples on 4x A100-80G
  (`/root/reference/README.md:332`) = 6.887 images/sec/chip.
- "stage2": stage-2 LoRA train step (SAM ViT-H Pallas encode + CLIP +
  7B LoRA fwd/bwd + mask decode + multi-task losses) on one chip.
- "tiny": smoke test.

MFU counts matmul FLOPs only (2*params*tokens inference, 6*params*tokens
training; attention score/value matmuls excluded), over the v5e bf16
peak — a lower bound on true utilization.

Env knobs: BENCH_BATCH, BENCH_SEQ, BENCH_STEPS, BENCH_ATTN (auto|xla|
flash), BENCH_REMAT (full|dots), BENCH_FUSED_CE, BENCH_QUANT, BENCH_SPLIT,
BENCH_SECONDARY, BENCH_E2E, BENCH_MEASURED_SPLIT, BENCH_MAX_MASKS,
BENCH_W8A8, BENCH_BIASW (composite rel-pos bias weights), BENCH_ATTN_I8
(int8 attention score dots; measured slower, default off), BENCH_KV8,
BENCH_LLM_A8, BENCH_PACKED.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# images/sec/chip derived from README.md:332 (595K samples, 6h, 4 GPUs).
A100_BASELINE = 595_000 / (6 * 3600) / 4
# BASELINE.json north star: 5x the reference's only per-chip datum.
TARGET_IMG_S = 5 * A100_BASELINE

V5E_BF16_PEAK = 197e12  # FLOP/s
V5E_INT8_PEAK = 394e12  # OP/s
V5E_HBM_BW = 819e9  # bytes/s


def count_matmul_params(tree) -> int:
    """Elements of >=2-D leaves (int8 'q' leaves included), excluding
    lookup tables (embed/pos_embed) — the 2*N*T FLOPs-model weight count."""
    import jax

    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        keys = [str(getattr(p, "key", "")) for p in path]
        # "biasw" (precomputed composite rel-pos bias weights) is excluded:
        # it is a serving-time re-expression of work the roofline already
        # prices at zero (the floor never counted the bias-term matmuls),
        # so counting it would inflate the floor and flatter the
        # measured-over-floor ratio across rounds.
        if any(k in ("embed_tokens", "pos_embed", "scale", "biasw") for k in keys):
            continue
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            total += leaf.size
    return total


def _fence(*trees):
    """Force completion of every program whose outputs are in `trees`.

    `jax.block_until_ready` can return before remote execution finishes on
    relayed/async TPU backends (measured: an 8k matmul "completed" in 25 us);
    a 1-element device->host read is the only dependable fence, so fence the
    LAST output of every timed program explicitly — a trailing program whose
    output is never read would otherwise fall outside the timed window.
    """
    import jax

    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree):
            _ = float(leaf.reshape(-1)[0])


def zeros_like_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda l: jnp.zeros(l.shape, l.dtype), tree)


def build(preset: str):
    import jax
    import jax.numpy as jnp

    from ullava_tpu.models import clip_vit, llama, ullava_core

    if preset == "tiny":
        cfg = ullava_core.UllavaCoreConfig.tiny()
    else:
        remat_policy = os.environ.get("BENCH_REMAT", "full")
        cfg = ullava_core.UllavaCoreConfig(
            llm=llama.LlamaConfig(dtype=jnp.bfloat16, remat=True,
                                  remat_policy=remat_policy,
                                  attn_impl=os.environ.get("BENCH_ATTN", "auto"),
                                  # bf16 rope (serving default): the f32
                                  # q/k staging costs ~11% of the seq-1024
                                  # step (traced); HF-parity tests pass at
                                  # bf16 tolerance either way.
                                  rope_f32=os.environ.get(
                                      "BENCH_ROPE_F32", "0") == "1"),
            vision=clip_vit.CLIPVisionConfig(dtype=jnp.bfloat16),
            vision_hidden_layer=-2,
            img_start_id=32001,
            img_end_id=32002,
            vid_start_id=32004,
            vid_end_id=32005,
            # Full-logit CE is ~3% faster than the fused streaming CE at
            # the bsz-8 operating point, which fits in 16 GB HBM; the fused
            # path unlocks larger batches (BENCH_FUSED_CE=1).
            fused_ce=os.environ.get("BENCH_FUSED_CE", "0") == "1",
        )
    # Shapes drive FLOPs; values don't. Abstract-init then zero-fill keeps
    # 13.5 GB of random-number generation off the profile.
    shapes = jax.eval_shape(
        lambda k: ullava_core.init_params(k, cfg), jax.random.PRNGKey(0)
    )
    params = {
        "core": jax.tree_util.tree_map(
            lambda l: __import__("jax").numpy.zeros(l.shape, l.dtype), shapes
        )
    }
    return cfg, params


def make_batch(cfg, batch: int, seq: int):
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    P = cfg.vision.num_patches
    ids = rng.integers(5, 1000, size=(batch, seq)).astype(np.int32)
    ids[:, 1] = cfg.img_start_id
    ids[:, 2 : 2 + P] = 3
    ids[:, 2 + P] = cfg.img_end_id
    labels = ids.copy()
    labels[:, : 2 + P + 1] = -100
    side = cfg.vision.image_size
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attn_lens": jnp.full((batch,), seq, jnp.int32),
        "images": jnp.asarray(
            rng.standard_normal((batch, side, side, 3)).astype(np.float32)
        ),
    }


def run(preset: str, batch: int, seq: int, steps: int):
    import jax

    from ullava_tpu.training import optim
    from ullava_tpu.training.train_step import (
        jit_step,
        make_stage1_step,
        make_train_state,
    )

    cfg, params = build(preset)
    # Stage-1 matmul-FLOPs model (lower bound, remat recompute excluded):
    # frozen CLIP forward 2*N*T_clip; trainable projector+LLM fwd+bwd
    # 6*N*T over all batch*seq tokens.
    n_llm = count_matmul_params(params["core"]["llm"])
    n_clip = count_matmul_params(params["core"]["vision"])
    n_proj = count_matmul_params(params["core"].get("projector", {}))
    clip_tokens = cfg.vision.num_patches + 1
    flops_per_img = (
        2 * n_clip * clip_tokens + 6 * (n_llm + n_proj) * seq
    )
    tx = optim.make_optimizer(2e-3)
    state, labels = make_train_state(params, tx, optim.STAGE1_PRETRAIN)
    step = jit_step(make_stage1_step(cfg, tx, labels))
    batch_data = make_batch(cfg, batch, seq)

    # Warmup/compile.
    state, metrics = step(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    _ = float(metrics["loss"])  # host round-trip fence

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    ips = batch / dt
    return ips, round(flops_per_img * ips / V5E_BF16_PEAK, 4)


def build_res(batch: int):
    """Full stage-2 serving model at reference scale, zero-filled."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ullava_tpu.models import clip_vit, llama, ullava, ullava_core
    from ullava_tpu.models.sam import build as sam_build

    core = ullava_core.UllavaCoreConfig(
        llm=llama.LlamaConfig(
            dtype=jnp.bfloat16, remat=False,
            # W8A8 prefill (BENCH_LLM_A8=0 for weight-only): prefill is
            # 68.6 TFLOP at B=16 and MXU-bound, so int8 dots are ~1.6x.
            a8_prefill=os.environ.get("BENCH_LLM_A8", "1") == "1",
            # Serving: flash prefill attention (no [B,H,S,S] fp32 score
            # materialization) + bf16 rope (no fp32 q/k staging).
            attn_impl=os.environ.get("BENCH_LLM_ATTN", "flash"),
            rope_f32=os.environ.get("BENCH_ROPE_F32", "0") == "1",
            # int8 KV cache, default ON (BENCH_KV8=0 for bf16): the fused
            # write-and-attend kernel (round 3) quantizes/writes the new
            # row inside the decode-attention pass, so the int8 decode step
            # now matches bf16's at B=32 while halving cache HBM — which is
            # what lets B=48 fit (bf16 KV OOMs there) and sets the bench's
            # best measured point (11.38 img/s at B=48 vs 11.17 at B=32).
            kv_quant=os.environ.get("BENCH_KV8", "1") == "1",
        ),
        vision=clip_vit.CLIPVisionConfig(
            dtype=jnp.bfloat16,
            # CLIP serving knobs (BENCH_CLIP_A8=1 / BENCH_CLIP_ATTN=flash):
            # int8 x int8 layer linears + lane-sliced flash attention over
            # the pad-masked 257->264 token sequence. Measured a wash at
            # B=48 (LLM phase 1.4528 vs 1.4530 s with both on — CLIP is
            # ~7% of the phase and its XLA lowering already overlaps well),
            # so the defaults stay on the numerically-closer
            # weight-only/XLA path.
            a8=os.environ.get("BENCH_CLIP_A8", "0") == "1",
            attn_impl=os.environ.get("BENCH_CLIP_ATTN", "xla"),
        ),
        vision_hidden_layer=-2,
        img_start_id=32001, img_end_id=32002,
        vid_start_id=32004, vid_end_id=32005,
    )
    import dataclasses

    sam_cfg = sam_build.sam_vit_h(dtype=jnp.bfloat16)
    # Serving defaults: int8 x int8 fused-MLP dots (BENCH_W8A8=0 for
    # weight-only) and head-major packed attention weights (BENCH_PACKED=0
    # for the transpose-based layout).
    if os.environ.get("BENCH_W8A8", "1") == "1":
        sam_cfg = dataclasses.replace(
            sam_cfg,
            vision=dataclasses.replace(
                sam_cfg.vision,
                mlp_w8a8=True,
                # int8 activations for qkv/proj (BENCH_ATTN_A8=1). Default
                # off: measured net-negative as a standalone XLA op (the
                # unfused per-row quantize adds HBM passes worth more than
                # the int8 MXU gain: 83.2 vs 78.5 ms/img encode at B=16).
                attn_w8a8=os.environ.get("BENCH_ATTN_A8", "0") == "1",
                # int8 x int8 attention SCORE dots inside the fused
                # kernels; av stays bf16. Default OFF: measured MUCH
                # slower on the fused path at B=48 (global attn 286 ->
                # 404 ms, window grid 139 -> 376 ms, rect 59 -> 108 ms —
                # the per-row in-kernel quant + int8 batched-dot lowering
                # cost far more than the 2x MXU rate saves at hd=80).
                # This replaces the round-2 unfused-path measurement the
                # old attn_w8a8 default cited; the projections themselves
                # DO run int8 x int8 (mlp_w8a8, fused LN+qkv/proj/MLP).
                attn_dots_i8=os.environ.get("BENCH_ATTN_I8", "0") == "1",
            ),
        )
    cfg = ullava.UllavaConfig(
        core=core, sam=sam_cfg,
        seg_token_idx=32007, loc_token_idx=32008,
        # RES serving answers ONE referred object per image (the reference
        # runs its per-[SEG] prompt-encode/mask-decode loop once per
        # sample, models/ullava.py:231-256), so the fixed-shape mask slot
        # cap is 1 here; the general chat path keeps the default 3
        # (BENCH_MAX_MASKS to override). Each extra slot re-runs the
        # two-way transformer + upscale on a full image-embedding copy
        # (~26 ms/batch at B=48).
        max_masks=int(os.environ.get("BENCH_MAX_MASKS", "1")),
    )
    shapes = jax.eval_shape(lambda k: ullava.init_params(k, cfg), jax.random.PRNGKey(0))

    # int8 weight-only on the frozen towers: bf16 weights alone are 15.4
    # of 15.75 GB on one v5e; quantizing SAM+CLIP (~1.4 GB saved) makes
    # single-chip RES serving fit. Quantized zeros are built directly from
    # shapes so the bf16 tree never materializes on device.
    quant_on = os.environ.get("BENCH_QUANT", "1") == "1"
    from ullava_tpu.ops import quant

    def build_tree(node, quant_keys):
        if hasattr(node, "shape"):
            return jnp.zeros(node.shape, node.dtype)
        out = {}
        for k, v in node.items():
            if (
                quant_on
                and k in quant_keys
                and hasattr(v, "ndim")
                and v.ndim >= 2
            ):
                scale_shape = v.shape[:-2] + (1,) + v.shape[-1:]
                out[k] = {
                    "q": jnp.zeros(v.shape, jnp.int8),
                    "scale": jnp.ones(scale_shape, jnp.float32),
                }
            elif isinstance(v, dict):
                out[k] = build_tree(v, quant_keys)
            elif isinstance(v, list):
                out[k] = [build_tree(x, quant_keys) for x in v]
            else:
                out[k] = jnp.zeros(v.shape, v.dtype)
        return out

    params = {
        "core": {
            # LLM weights int8 too: decode is HBM-bandwidth bound, so 4x
            # smaller weights are both the only way the full stack fits in
            # 16 GB and a decode-throughput win.
            "llm": build_tree(shapes["core"]["llm"], set(quant.LLAMA_QUANT_KEYS)),
            "vision": build_tree(shapes["core"]["vision"], set(quant.CLIP_QUANT_KEYS)),
            "projector": build_tree(shapes["core"]["projector"], ()),
        },
        "sam": {
            "image_encoder": build_tree(
                shapes["sam"]["image_encoder"], set(quant.SAM_ENCODER_QUANT_KEYS)
            ),
            "prompt_encoder": build_tree(shapes["sam"]["prompt_encoder"], ()),
            "mask_decoder": build_tree(shapes["sam"]["mask_decoder"], ()),
        },
        "seg_projector": build_tree(shapes["seg_projector"], ()),
        "det_projector": build_tree(shapes["det_projector"], ()),
        "det_decoder": build_tree(shapes["det_decoder"], ()),
    }
    # Off by default: measured net-negative on v5e (the removed head-split/
    # transpose copies are cheaper than the +60% qkv/proj FLOPs the 80->128
    # lane padding costs). Kept as an experiment knob with parity tests.
    if os.environ.get("BENCH_PACKED", "0") == "1":
        from ullava_tpu.models.sam.image_encoder import pack_sam_attention

        params["sam"]["image_encoder"] = pack_sam_attention(
            params["sam"]["image_encoder"], cfg.sam.vision
        )
    elif quant_on and os.environ.get("BENCH_BIASW", "1") == "1":
        # Fold the window rel-pos bias matmuls into the LN+qkv kernel as
        # precomputed composite weights (BENCH_BIASW=0 for the standalone
        # bias-term matmuls). Resident-layout serving path only.
        from ullava_tpu.models.sam.image_encoder import (
            precompute_window_bias_weights,
        )

        params["sam"]["image_encoder"] = precompute_window_bias_weights(
            params["sam"]["image_encoder"], cfg.sam.vision
        )
    return cfg, params


def res_roofline(cfg, params, batch: int, prompt_len: int,
                 max_new_tokens: int) -> dict:
    """Per-phase achievable-minimum times (seconds per batch) for the RES
    serving pipeline on one v5e, from model shapes alone.

    These are HARD floors — matmul OPs at MXU peak plus, for decode, the
    weight+KV HBM reads — not targets: they exclude softmax/LN/rope VPU
    time, kernel launch, HBM traffic of activations, and the attention
    exp over S^2 scores (the global-attention VPU floor alone is worth
    tens of ms at B=48). A measured/floor ratio near 1 therefore means
    the phase is DONE on one chip and further gains must come from
    quantization (deeper than int8), sparsity, or more chips."""
    B = batch
    n_llm = count_matmul_params(params["core"]["llm"])
    n_clip = count_matmul_params(params["core"]["vision"])
    n_sam = count_matmul_params(params["sam"]["image_encoder"])
    n_samdec = count_matmul_params(params["sam"]["mask_decoder"]) + (
        count_matmul_params(params["sam"]["prompt_encoder"])
    )
    lc, vc = cfg.core.llm, cfg.sam.vision

    # --- LLM phase: CLIP encode (bf16) + prefill (W8A8) + decode ---
    clip_tokens = cfg.core.vision.num_patches + 1
    clip_s = 2 * n_clip * clip_tokens * B / V5E_BF16_PEAK
    prefill_peak = V5E_INT8_PEAK if lc.a8_prefill else V5E_BF16_PEAK
    prefill_s = 2 * n_llm * prompt_len * B / prefill_peak
    # flash attention dots (qk + av), bf16
    flash_s = (
        2 * 2 * B * lc.num_heads * prompt_len**2 * lc.head_dim
    ) / V5E_BF16_PEAK
    # decode: weight-read + KV-read bound (int8 weights; KV at the cache
    # dtype, average live length over the generated tokens)
    w_bytes = n_llm  # int8
    avg_len = prompt_len + max_new_tokens / 2
    kv_bytes = (
        2 * lc.num_layers * B * avg_len * lc.num_kv_heads * lc.head_dim
        * (1 if lc.kv_quant else 2)
    )
    decode_s = max_new_tokens * (w_bytes + kv_bytes) / V5E_HBM_BW
    llm_floor = clip_s + prefill_s + flash_s + decode_s

    # --- SAM phase: ViT-H encode + prompt/mask decode ---
    sam_tokens = vc.grid * vc.grid
    sam_peak = V5E_INT8_PEAK if vc.mlp_w8a8 else V5E_BF16_PEAK
    sam_proj_s = 2 * n_sam * sam_tokens * B / sam_peak
    n_glb = len(vc.global_attn_indexes)
    n_win = vc.depth - n_glb
    glb_attn_s = (
        n_glb * 2 * 2 * B * vc.num_heads * sam_tokens**2 * vc.head_dim
    ) / V5E_BF16_PEAK
    win_attn_s = (
        n_win * 2 * 2 * B * vc.num_heads
        * sam_tokens * vc.window_size**2 * vc.head_dim
    ) / V5E_BF16_PEAK
    # Each mask slot runs its own two-way transformer + upscale pass over
    # a full image-embedding copy (fixed-shape N = max_masks prompts).
    samdec_s = 2 * n_samdec * sam_tokens * B * cfg.max_masks / V5E_BF16_PEAK
    sam_floor = sam_proj_s + glb_attn_s + win_attn_s + samdec_s

    return {
        "basis": (
            "matmul OPs at MXU peak (int8 394T where the phase runs W8A8, "
            "bf16 197T otherwise) + decode weight/KV HBM reads at 819GB/s; "
            "EXCLUDES softmax/LN/rope VPU time and activation HBM traffic "
            "— a hard floor, not a target"
        ),
        "llm_floor_s": round(llm_floor, 4),
        "llm_floor_parts_s": {
            "clip": round(clip_s, 4), "prefill": round(prefill_s, 4),
            "flash": round(flash_s, 4), "decode": round(decode_s, 4),
        },
        "sam_floor_s": round(sam_floor, 4),
        "sam_floor_parts_s": {
            "proj_mlp": round(sam_proj_s, 4),
            "global_attn": round(glb_attn_s, 4),
            "window_attn": round(win_attn_s, 4),
            "mask_decode": round(samdec_s, 4),
        },
    }


def ladder_floors(cfg, params, prompt_len: int, max_new_tokens: int,
                  batches=(16, 32, 48, 64, 96, 128)) -> dict:
    """Target-vs-floor reconciliation (VERDICT r4 item 1): floor-implied
    img/s per batch rung, plus the B->inf asymptote. Only the decode
    weight-read term is batch-independent (it amortizes per image as B
    grows); everything else is linear in B, so per-image floor time is
    a + c/B and the asymptote is 1/a."""
    rows = []
    totals = {}
    for b in batches:
        r = res_roofline(cfg, params, b, prompt_len, max_new_tokens)
        totals[b] = r["llm_floor_s"] + r["sam_floor_s"]
        rows.append({"batch": b, "floor_img_s": round(b / totals[b], 2)})
    b0, b1 = batches[0], batches[-1]
    a = (totals[b1] - totals[b0]) / (b1 - b0)  # per-image linear term
    return {
        "floors": rows,
        "asymptote_img_s": round(1.0 / a, 2),
        "target_img_s": round(TARGET_IMG_S, 2),
        "note": (
            "hard matmul+HBM floors per batch rung (see roofline basis); "
            "the asymptote is the B->inf limit where decode weight reads "
            "fully amortize. If target_img_s exceeds the asymptote, the "
            "5x target is not physically reachable on one chip at this "
            "serving configuration (int8 weights/KV, "
            f"{max_new_tokens}-token decode) — see STATUS.md."
        ),
    }


def run_res(batch: int, steps: int, max_new_tokens: int = 32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ullava_tpu.models import ullava
    from ullava_tpu.models.generate import GenerateConfig

    cfg, params = build_res(batch)
    rng = np.random.default_rng(0)
    P = cfg.core.vision.num_patches
    prompt_len = P + 64  # 256 image tokens + prompt text
    ids = rng.integers(5, 1000, size=(batch, prompt_len)).astype(np.int32)
    ids[:, 1] = cfg.core.img_start_id
    ids[:, 2 : 2 + P] = 3
    ids[:, 2 + P] = cfg.core.img_end_id

    batch_data = dict(
        input_ids=jnp.asarray(ids),
        prompt_lens=jnp.full((batch,), prompt_len, jnp.int32),
        images=jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
        ),
        images_sam=jnp.asarray(
            rng.standard_normal((batch, 1024, 1024, 3)).astype(np.float32)
        ),
    )
    gen = GenerateConfig(max_new_tokens=max_new_tokens, temperature=0.0)

    # Two jit programs (generation, SAM decode) keep peak HLO-temp memory
    # low: weights alone fill 15.4 of 15.75 GB on a single v5e.
    from ullava_tpu.models import generate as gen_mod
    from ullava_tpu.models import projector as proj_mod

    @jax.jit
    def serve_llm(p, b):
        out = gen_mod.generate(
            p["core"], cfg.core, gen,
            input_ids=b["input_ids"], prompt_lens=b["prompt_lens"],
            images=b["images"],
        )
        seg_h, seg_valid = gen_mod.readout_token_hidden(
            out["sequences"], out["hidden_last"], out["lengths"],
            cfg.seg_token_idx, cfg.max_masks,
        )
        seg_embeds = proj_mod.apply_text_head(
            p["seg_projector"], seg_h.astype(jnp.float32)
        )
        return out["sequences"], out["lengths"], seg_embeds, seg_valid

    @jax.jit
    def serve_sam(p, images_sam, seg_embeds):
        emb = ullava.get_visual_embs(p, cfg, images_sam)
        from ullava_tpu.models.sam import build as sam_build

        low, iou = sam_build.forward_masks(p["sam"], cfg.sam, emb, seg_embeds)
        return low

    split_mode = os.environ.get("BENCH_SPLIT", "1") != "0"
    if not split_mode:
        # Single-program serve (int8 weights leave headroom for the
        # combined temp arena; saves the inter-program dispatch gap).
        @jax.jit
        def serve_one(p, b):
            out = ullava.evaluate(p, cfg, gen, **b)
            return out["lengths"], out["low_res_masks"]

        def serve(p, b):
            return serve_one(p, b)
    else:
        def serve(p, b):
            seqs, lens, seg_embeds, seg_valid = serve_llm(p, b)
            low = serve_sam(p, b["images_sam"], seg_embeds)
            return lens, low

    lens, low = serve(params, batch_data)
    _fence(lens, low)

    t0 = time.perf_counter()
    for _ in range(steps):
        lens, low = serve(params, batch_data)
    _fence(lens, low)
    dt = (time.perf_counter() - t0) / steps

    # Coarse phase split: time the two serve programs separately
    # (tools/phase_split.py gives the finer per-phase breakdown).
    phase = {}
    if split_mode:
        def timed(fn, *a):
            out = fn(*a)
            _fence(out)
            t = time.perf_counter()
            for _ in range(steps):
                out = fn(*a)
            _fence(out)
            return (time.perf_counter() - t) / steps

        t_llm = timed(serve_llm, params, batch_data)
        seg0 = jnp.zeros((batch, cfg.max_masks, 256), jnp.float32)
        t_sam = timed(serve_sam, params, batch_data["images_sam"], seg0)
        roof = res_roofline(cfg, params, batch, prompt_len, max_new_tokens)
        total_floor = roof["llm_floor_s"] + roof["sam_floor_s"]
        phase = {
            "llm_clip_prefill_decode_s": round(t_llm, 4),
            "sam_encode_mask_decode_s": round(t_sam, 4),
            "roofline": {
                **roof,
                "llm_measured_over_floor": round(t_llm / roof["llm_floor_s"], 3),
                "sam_measured_over_floor": round(t_sam / roof["sam_floor_s"], 3),
                "floor_img_s": round(batch / total_floor, 2),
                "target_img_s": round(TARGET_IMG_S, 2),
            },
            # Target-vs-floor reconciliation across the batch ladder
            # (pure shape math, no device work; see STATUS.md).
            "ladder_floors": ladder_floors(
                cfg, params, prompt_len, max_new_tokens
            ),
        }
        if os.environ.get("BENCH_MEASURED_SPLIT", "1") == "1":
            # Measured LLM sub-phase split (VERDICT r4 item 4): CLIP alone,
            # then a max_new_tokens=1 generate so decode separates out as
            # (t_full - t_1step) * n/(n-1); prefill is the remainder of the
            # 1-step run after CLIP and its single decode step. The
            # [SEG]-readout + seg-projector tail rides inside "prefill"
            # residue (sub-ms at these shapes).
            from ullava_tpu.models import ullava_core as core_mod

            @jax.jit
            def clip_prog(p, images):
                return core_mod.encode_image(p["core"], cfg.core, images)

            gen1 = GenerateConfig(max_new_tokens=1, temperature=0.0)

            @jax.jit
            def serve_llm1(p, b):
                out = gen_mod.generate(
                    p["core"], cfg.core, gen1,
                    input_ids=b["input_ids"], prompt_lens=b["prompt_lens"],
                    images=b["images"],
                )
                return out["sequences"], out["lengths"]

            t_clip = timed(clip_prog, params, batch_data["images"])
            t_mnt1 = timed(serve_llm1, params, batch_data)
            n = max_new_tokens
            decode_s = max((t_llm - t_mnt1) * n / (n - 1), 0.0)
            prefill_s = max(t_mnt1 - t_clip - decode_s / n, 0.0)
            fp = roof["llm_floor_parts_s"]
            phase["llm_measured_parts_s"] = {
                "clip": round(t_clip, 4),
                "prefill": round(prefill_s, 4),
                "decode": round(decode_s, 4),
                "over_floor": {
                    "clip": round(t_clip / fp["clip"], 2),
                    "prefill": round(
                        prefill_s / (fp["prefill"] + fp["flash"]), 2
                    ),
                    "decode": round(decode_s / fp["decode"], 2),
                },
            }

    # Matmul-FLOPs MFU (lower bound; attention matmuls excluded).
    n_llm = count_matmul_params(params["core"]["llm"])
    n_clip = count_matmul_params(params["core"]["vision"])
    n_sam = count_matmul_params(params["sam"]["image_encoder"])
    clip_tokens = cfg.core.vision.num_patches + 1
    sam_tokens = (cfg.sam.vision.img_size // cfg.sam.vision.patch_size) ** 2
    flops_per_img = 2 * (
        n_llm * (prompt_len + max_new_tokens)
        + n_clip * clip_tokens
        + n_sam * sam_tokens
    )
    mfu = flops_per_img * (batch / dt) / V5E_BF16_PEAK
    return batch / dt, {"mfu": round(mfu, 4), "phase_split": phase}


def run_res_e2e(batch: int, steps: int, max_new_tokens: int = 32):
    """North-star e2e RES serving: uint8 JPEG frames in, masks out.

    Host work is ONLY jpeg-decode + longest-side-1024 resize (loader
    threads, overlapped with device compute); the CLIP white-pad/resize/
    normalize and SAM normalize/pad run as XLA ops INSIDE the serve
    program from one shared uint8 canvas (`ops/image_ops.py`), per
    BASELINE.json's north-star definition. Returns (device_ips, e2e_ips):
    device_ips stages the canvases on device first (transform + model
    only), e2e_ips includes jpeg decode, host resize, and H2D.
    """
    import io
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ullava_tpu.models import generate as gen_mod
    from ullava_tpu.models import projector as proj_mod
    from ullava_tpu.models import ullava
    from ullava_tpu.models.generate import GenerateConfig
    from ullava_tpu.ops import image_ops

    cfg, params = build_res(batch)
    rng = np.random.default_rng(0)
    P = cfg.core.vision.num_patches
    prompt_len = P + 64
    ids = rng.integers(5, 1000, size=(batch, prompt_len)).astype(np.int32)
    ids[:, 1] = cfg.core.img_start_id
    ids[:, 2 : 2 + P] = 3
    ids[:, 2 + P] = cfg.core.img_end_id
    ids = jnp.asarray(ids)
    lens = jnp.full((batch,), prompt_len, jnp.int32)
    gen = GenerateConfig(max_new_tokens=max_new_tokens, temperature=0.0)

    # JPEG pool: photographic-entropy frames — a smooth illumination
    # gradient plus three noise octaves (coarse/mid/fine) — at camera-ish
    # resolution. The old single-octave low-frequency pool decoded
    # materially faster than real photographs; pure noise is 3-4x slower.
    # This lands in the real-photo range (~60-130 KB per 640x480 q85).
    n_pool = 48
    jpegs = []
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    for k in range(n_pool):
        base = (
            110.0
            + 60.0 * np.sin(xx / 640.0 * (1.5 + k % 3) + 0.3 * k)
            + 45.0 * np.cos(yy / 480.0 * 2.2 + 0.7 * k)
        )[..., None]
        oct1 = np.repeat(np.repeat(
            rng.standard_normal((30, 40, 3)), 16, 0), 16, 1)
        oct2 = np.repeat(np.repeat(
            rng.standard_normal((120, 160, 3)), 4, 0), 4, 1)
        oct3 = rng.standard_normal((480, 640, 3))
        frame = np.clip(
            base + 34.0 * oct1 + 16.0 * oct2 + 6.0 * oct3, 0, 255
        ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, "JPEG", quality=85)
        jpegs.append(buf.getvalue())

    @jax.jit
    def serve_llm(p, ids, lens, canvas, sizes):
        clip_px = image_ops.clip_preprocess(canvas, sizes)
        out = gen_mod.generate(
            p["core"], cfg.core, gen,
            input_ids=ids, prompt_lens=lens, images=clip_px,
        )
        seg_h, seg_valid = gen_mod.readout_token_hidden(
            out["sequences"], out["hidden_last"], out["lengths"],
            cfg.seg_token_idx, cfg.max_masks,
        )
        seg_embeds = proj_mod.apply_text_head(
            p["seg_projector"], seg_h.astype(jnp.float32)
        )
        return out["lengths"], seg_embeds

    @jax.jit
    def serve_sam(p, canvas, sizes, seg_embeds):
        sam_px = image_ops.sam_preprocess(canvas, sizes)
        emb = ullava.get_visual_embs(p, cfg, sam_px)
        from ullava_tpu.models.sam import build as sam_build

        low, iou = sam_build.forward_masks(p["sam"], cfg.sam, emb, seg_embeds)
        return low

    def serve(p, ids, lens, canvas, sizes):
        lengths, seg_embeds = serve_llm(p, ids, lens, canvas, sizes)
        low = serve_sam(p, canvas, sizes, seg_embeds)
        return lengths, low

    pool = ThreadPoolExecutor(max_workers=8)
    try:
        import cv2

        def _decode(buf):
            return cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)[
                :, :, ::-1
            ]
    except ImportError:

        def _decode(buf):
            return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))

    # Ping-pong batch buffers: loader threads decode+resize straight into
    # a preallocated slot (no per-image canvas alloc, no np.stack memcpy).
    bufs = [np.zeros((batch, 1024, 1024, 3), np.uint8) for _ in range(3)]

    def host_batch(step):
        canvas = bufs[step % len(bufs)]

        def decode_one(i):
            img = _decode(jpegs[(step * batch + i) % n_pool])
            return image_ops.make_canvas(img, out=canvas[i])[1]

        sizes = np.asarray(list(pool.map(decode_one, range(batch))), np.int32)
        return canvas, sizes

    # --- raw host ingest capacity: decode + resize WITHOUT the device in
    # the loop. This is the overlap margin the e2e rate rides on: e2e can
    # only stay within ~10% of device-only while capacity comfortably
    # exceeds the device rate.
    host_batch(0)  # warm the thread pool / allocators
    cap_steps = max(2, steps)
    t0 = time.perf_counter()
    for s in range(cap_steps):
        host_batch(s)
    host_capacity_ips = batch * cap_steps / (time.perf_counter() - t0)

    # --- device-only (canvases staged): transform + model ---
    c0, s0 = host_batch(0)
    c0d, s0d = jax.device_put(c0), jax.device_put(s0)
    lengths, low = serve(params, ids, lens, c0d, s0d)
    _fence(lengths, low)
    t0 = time.perf_counter()
    for _ in range(steps):
        lengths, low = serve(params, ids, lens, c0d, s0d)
    _fence(lengths, low)
    device_ips = batch / ((time.perf_counter() - t0) / steps)

    # --- e2e: loader thread decodes AND uploads batch n+1/n+2 while the
    # device runs batch n (device_put is async; issuing it from the
    # producer overlaps the H2D transfer with compute) ---
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def producer():
        for step in range(steps + 1):
            canvas, sizes = host_batch(step)
            q.put((jax.device_put(canvas), jax.device_put(sizes)))

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    # pipeline-fill warmup batch, then steady-state measurement
    cd, sd = q.get()
    outs = serve(params, ids, lens, cd, sd)
    _fence(*outs)
    t0 = time.perf_counter()
    for _ in range(steps):
        cd, sd = q.get()
        outs = serve(params, ids, lens, cd, sd)
    _fence(*outs)
    e2e_ips = (batch * steps) / (time.perf_counter() - t0)
    th.join()
    pool.shutdown()
    return device_ips, e2e_ips, host_capacity_ips


def run_stage2(batch: int, steps: int, seq: int = 512):
    """Stage-2 LoRA training step at reference scale on one chip:
    SAM ViT-H encode (Pallas kernels) + CLIP + 7B LoRA fwd/bwd + mask
    decoder + multi-task losses. (Full-finetune stage 2 needs the fsdp
    axis — Adam moments for 7B exceed one chip — exactly like the
    reference needed 8 GPUs.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ullava_tpu.models import llama as llama_mod
    from ullava_tpu.models import ullava
    from ullava_tpu.training import optim
    from ullava_tpu.training.train_step import (
        jit_step, make_stage2_step, make_train_state,
    )

    cfg, params = build_res(batch)  # int8 frozen towers
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        core=dataclasses.replace(
            cfg.core,
            llm=dataclasses.replace(cfg.core.llm, remat=True),
        ),
        mask_loss_frame=512,
    )
    # LoRA adapters on the (quantized) base weights: bf16 A/B, scale 2.0.
    params["core"]["llm"] = llama_mod.add_lora(
        params["core"]["llm"], cfg.core.llm, jax.random.PRNGKey(0), r=8
    )

    tx = optim.make_optimizer(2e-4)
    patterns = (
        r"^core/llm/layers/(q|v)_proj_lora_(a|b)$",
        r"^seg_projector/", r"^det_projector/", r"^det_decoder/",
        r"^sam/mask_decoder/(?!iou_head)",
    )
    state, labels = make_train_state(params, tx, patterns)
    step = jit_step(make_stage2_step(cfg, tx, labels))

    rng = np.random.default_rng(0)
    P = cfg.core.vision.num_patches
    F = cfg.mask_loss_frame
    ids = rng.integers(5, 1000, size=(batch, seq)).astype(np.int32)
    ids[:, 1] = cfg.core.img_start_id
    ids[:, 2 : 2 + P] = 3
    ids[:, 2 + P] = cfg.core.img_end_id
    ids[:, 2 + P + 2] = cfg.seg_token_idx
    ids[:, 2 + P + 4] = cfg.loc_token_idx
    batch_data = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "attn_lens": jnp.full((batch,), seq, jnp.int32),
        "images": jnp.asarray(rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)),
        "images_sam": jnp.asarray(rng.standard_normal((batch, 1024, 1024, 3)).astype(np.float32)),
        "gt_masks": jnp.asarray((rng.random((batch, 3, F, F)) > 0.5).astype(np.float32)),
        "mask_valid": jnp.asarray(np.tile([True, False, False], (batch, 1))),
        "gt_boxes": jnp.asarray(rng.random((batch, 3, 4)).astype(np.float32)),
        "box_valid": jnp.asarray(np.tile([True, False, False], (batch, 1))),
        "input_hw": jnp.full((batch, 2), 1024, jnp.int32),
    }
    state, metrics = step(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_data)
    jax.block_until_ready(metrics["loss"])
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    ips = batch / dt
    # Stage-2 matmul-FLOPs model (lower bound, remat recompute excluded):
    # frozen SAM/CLIP forward 2*N*T; LLM forward + activation-grad
    # backward 4*N*T (weight grads flow only into the rank-8 LoRA
    # factors, negligible FLOPs).
    n_llm = count_matmul_params(params["core"]["llm"])
    n_clip = count_matmul_params(params["core"]["vision"])
    n_sam = count_matmul_params(params["sam"]["image_encoder"])
    clip_tokens = cfg.core.vision.num_patches + 1
    sam_tokens = (cfg.sam.vision.img_size // cfg.sam.vision.patch_size) ** 2
    flops_per_img = (
        2 * n_sam * sam_tokens + 2 * n_clip * clip_tokens + 4 * n_llm * seq
    )
    return ips, round(flops_per_img * ips / V5E_BF16_PEAK, 4)


# Self-describing baseline note (VERDICT r2 item 8): the reference
# publishes no serving/RES throughput; its only per-chip datum is the
# stage-1 A100 training figure, so vs_baseline for the serving metric is
# serving-throughput / training-throughput — NOT a same-task comparison.
COMPARISON_BASIS = (
    "reference stage-1 A100 training img/s/chip "
    "(/root/reference/README.md:332: 595K samples, 6h/epoch, 4x A100-80G "
    "= 6.887 img/s/chip); the reference publishes no RES serving "
    "throughput. BASELINE.json north star = 5x this figure."
)


def _log_retry(exc: BaseException, batch) -> None:
    sys.stderr.write(
        f"bench: batch {batch} failed with {type(exc).__name__}: "
        f"{str(exc)[-400:]}\n  -> retrying remaining batches in fresh "
        "subprocesses\n"
    )


def _retry_in_subprocess(batches) -> bool:
    """After an on-chip OOM, this process's TPU arena is poisoned — a
    smaller batch then fails spuriously. Retry each remaining batch in a
    fresh subprocess (BENCH_BATCH pinned) and forward its JSON line."""
    import subprocess

    for b in batches:
        env = dict(os.environ)
        env["BENCH_BATCH"] = str(b)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            return True
    return False


def main():
    preset = os.environ.get("BENCH_PRESET", "res")
    if preset == "res_e2e":
        steps = int(os.environ.get("BENCH_STEPS", "3"))
        b = int(os.environ.get("BENCH_BATCH", "32"))
        device_ips, e2e_ips, host_cap_ips = run_res_e2e(b, steps)
        print(json.dumps({
            "metric": (
                "RES serving e2e (jpeg in -> on-device CLIP/SAM transforms "
                f"-> masks out, bsz {b})"
            ),
            "value": round(e2e_ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(e2e_ips / A100_BASELINE, 3),
            "comparison_basis": COMPARISON_BASIS,
            "device_only_with_transforms": round(device_ips, 3),
            # decode+resize alone (loader thread pool, no device): the
            # host-side ceiling the e2e overlap depends on.
            "host_ingest_capacity": round(host_cap_ips, 3),
        }))
        return
    if preset == "stage2":
        steps = int(os.environ.get("BENCH_STEPS", "3"))
        batches = (
            [int(os.environ["BENCH_BATCH"])]
            if "BENCH_BATCH" in os.environ else [4, 2, 1]
        )
        last_err = None
        seq2 = int(os.environ.get("BENCH_SEQ", "512"))
        for i, b in enumerate(batches):
            try:
                ips, mfu = run_stage2(b, steps, seq=seq2)
                print(json.dumps({
                    "metric": (
                        "stage2 LoRA train step (SAM ViT-H Pallas encode + "
                        f"CLIP + 7B LoRA fwd/bwd + mask decode + losses, "
                        f"bsz {b}, seq {seq2})"
                    ),
                    "value": round(ips, 3),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(ips / A100_BASELINE, 3),
                    "mfu": mfu,
                }))
                return
            except Exception as e:
                last_err = e
                _log_retry(e, b)
                if _retry_in_subprocess(batches[i + 1 :]):
                    return
                break
        raise SystemExit(f"stage2 bench failed: {last_err}")
    if preset == "res":
        steps = int(os.environ.get("BENCH_STEPS", "3"))
        # B=48 fits only with the int8 KV cache (default); the ladder
        # falls back on OOM.
        batches = (
            [int(os.environ["BENCH_BATCH"])]
            if "BENCH_BATCH" in os.environ else [48, 32, 16, 8, 4, 2, 1]
        )
        last_err = None
        for i, b in enumerate(batches):
            try:
                ips, details = run_res(b, steps)
            except Exception as e:
                last_err = e
                _log_retry(e, b)
                if _retry_in_subprocess(batches[i + 1 :]):
                    return
                break
            record = {
                "metric": (
                    "RefCOCO RES serving images/sec/chip (SAM ViT-H encode "
                    "+ CLIP ViT-L + 7B prefill + 32-tok decode + [SEG] "
                    f"readout + SAM mask decode, int8 weights, bsz {b})"
                ),
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                # Only per-chip reference point the upstream publishes is
                # its stage-1 A100 figure; north star is 5x it.
                "vs_baseline": round(ips / A100_BASELINE, 3),
                "comparison_basis": COMPARISON_BASIS,
                **details,
            }
            if os.environ.get("BENCH_SECONDARY", "1") == "1":
                import gc

                import jax

                gc.collect()
                jax.clear_caches()
                try:
                    ips1, mfu1 = run("7b", 8, 384, 3)
                    record["secondary"] = {
                        "metric": (
                            "stage1 pretrain throughput (CLIP ViT-L + proj "
                            "+ LLaMA-7B fwd/bwd, bf16, bsz 8, seq 384)"
                        ),
                        "value": round(ips1, 3),
                        "unit": "images/sec/chip",
                        "vs_baseline": round(ips1 / A100_BASELINE, 3),
                        "comparison_basis": (
                            "same A100 training figure; NOTE measured at "
                            "seq 384 — the reference's stage-1 operating "
                            "point is model_max_length 1024 (its true avg "
                            "caption seq is unknown); see STATUS.md for the "
                            "seq-1024 row"
                        ),
                        "mfu": mfu1,
                    }
                except Exception as e:
                    record["secondary"] = {"error": str(e)[-300:]}
                gc.collect()
                jax.clear_caches()
                try:
                    # The reference's own operating point
                    # (configs/train/ullava_core.yaml model_max_length).
                    ips2, mfu2 = run("7b", 4, 1024, 3)
                    record["secondary_seq1024"] = {
                        "metric": (
                            "stage1 pretrain throughput (CLIP ViT-L + proj "
                            "+ LLaMA-7B fwd/bwd, bf16, bsz 4, seq 1024 — "
                            "the reference model_max_length)"
                        ),
                        "value": round(ips2, 3),
                        "unit": "images/sec/chip",
                        "vs_baseline": round(ips2 / A100_BASELINE, 3),
                        "comparison_basis": (
                            "same A100 training figure, apples-to-apples "
                            "max seq; the reference's true avg caption seq "
                            "is unknown (595K mixed-length captions)"
                        ),
                        "mfu": mfu2,
                    }
                except Exception as e:
                    record["secondary_seq1024"] = {"error": str(e)[-300:]}
            if os.environ.get("BENCH_E2E", "1") == "1":
                # e2e ingest run in a fresh subprocess (own TPU arena).
                import subprocess

                env = dict(os.environ)
                env.update(BENCH_PRESET="res_e2e", BENCH_BATCH=str(b),
                           BENCH_SECONDARY="0", BENCH_E2E="0")
                # The parent still holds its TPU arena while the child
                # runs; the child occasionally loses the HBM race
                # (RESOURCE_EXHAUSTED) even at a batch the parent just
                # proved. Shed what we can and retry once.
                import gc as _gc

                import jax as _jax

                _gc.collect()
                _jax.clear_caches()
                for attempt in range(2):
                    try:
                        proc = subprocess.run(
                            [sys.executable, os.path.abspath(__file__)],
                            env=env, capture_output=True, text=True,
                            timeout=1800,
                        )
                        record["e2e"] = (
                            json.loads(proc.stdout.strip().splitlines()[-1])
                            if proc.returncode == 0 and proc.stdout.strip()
                            else {"error": (proc.stderr or "")[-300:]}
                        )
                    except Exception as e:
                        record["e2e"] = {"error": str(e)[-300:]}
                    if "error" not in record["e2e"]:
                        break
                    time.sleep(5)
            print(json.dumps(record))
            return
        raise SystemExit(f"res bench failed: {last_err}")
    seq = int(os.environ.get("BENCH_SEQ", "384" if preset == "7b" else "32"))
    steps = int(os.environ.get("BENCH_STEPS", "5"))
    batches = (
        [int(os.environ["BENCH_BATCH"])]
        if "BENCH_BATCH" in os.environ
        else ([8, 4, 2, 1] if preset == "7b" else [8])
    )
    last_err = None
    for i, b in enumerate(batches):
        try:
            ips, mfu = run(preset, b, seq, steps)
            print(
                json.dumps(
                    {
                        "metric": (
                            "stage1 pretrain throughput (CLIP ViT-L + proj + "
                            f"LLaMA-7B fwd/bwd, bf16, bsz {b}, seq {seq})"
                            if preset == "7b"
                            else f"stage1 tiny-model throughput (bsz {b}, seq {seq})"
                        ),
                        "value": round(ips, 3),
                        "unit": "images/sec/chip",
                        "vs_baseline": round(ips / A100_BASELINE, 3),
                        "mfu": mfu,
                    }
                )
            )
            return
        except Exception as e:  # OOM or compile failure -> smaller batch
            last_err = e
            _log_retry(e, b)
            if _retry_in_subprocess(batches[i + 1 :]):
                return
            break
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
