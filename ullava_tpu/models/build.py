"""Model construction from config + released checkpoints.

The TPU equivalent of the reference's entry-point model assembly
(`/root/reference/train_ullava_core.py:65-140`,
`train_ullava.py:147-261`):

- tokenizer from the LLaMA/Vicuna checkpoint dir, pad token `[PAD]`;
- LLaMA weights from the HF checkpoint (`llm_path`), CLIP tower from
  `vision_encoder`, both converted to stacked pytrees;
- the six multimodal tokens added with the reference's mean-init rules;
- stage 2: `[SEG] [LOC] [tag] [/tag]` tokens, SAM from
  `sam_path` (original Meta `.pth` naming), seg/det heads fresh or from a
  full ullava checkpoint (orbax).

Every loader accepts `None` paths for random-init (tests / dry runs).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.constants import (
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_IMG_END_TOKEN,
    DEFAULT_IMG_START_TOKEN,
    DEFAULT_LOC_TOKEN,
    DEFAULT_PAD_TOKEN,
    DEFAULT_SEG_TOKEN,
    DEFAULT_TAG_END,
    DEFAULT_TAG_START,
    DEFAULT_VID_END_TOKEN,
    DEFAULT_VID_START_TOKEN,
    DEFAULT_VIDEO_PATCH_TOKEN,
)
from ullava_tpu.models import clip_vit, llama, projector, tools, ullava, ullava_core
from ullava_tpu.models.sam import SamConfig, init_sam_params, sam_vit_h
from ullava_tpu.models.sam.convert import convert_sam
from ullava_tpu.models.weights import (
    convert_clip_vision,
    convert_llama,
    load_state_dict,
)

logger = logging.getLogger(__name__)

MM_TOKEN_MAP = {
    "IMG_PATCH": DEFAULT_IMAGE_PATCH_TOKEN,
    "IMG_START": DEFAULT_IMG_START_TOKEN,
    "IMG_END": DEFAULT_IMG_END_TOKEN,
    "VID_PATCH": DEFAULT_VIDEO_PATCH_TOKEN,
    "VID_START": DEFAULT_VID_START_TOKEN,
    "VID_END": DEFAULT_VID_END_TOKEN,
}


def build_tokenizer(path: Optional[str], model_max_length: int = 1024):
    """HF fast tokenizer from a local checkpoint dir (needs tokenizer.json;
    sentencepiece slow tokenizers are unavailable in this env)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(
        path, model_max_length=model_max_length, use_fast=True,
        local_files_only=True,
    )
    if tok.pad_token is None:
        tok.add_special_tokens({"pad_token": DEFAULT_PAD_TOKEN})
    return tok


def _llama_cfg_from_hf(path: str, dtype) -> llama.LlamaConfig:
    import json

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    return llama.LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        dtype=dtype,
    )


def _clip_cfg_from_hf(path: str, dtype) -> clip_vit.CLIPVisionConfig:
    import json

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    hf = hf.get("vision_config", hf)  # full CLIP vs vision-only checkpoints
    return clip_vit.CLIPVisionConfig(
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        image_size=hf.get("image_size", 224),
        patch_size=hf.get("patch_size", 14),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
        dtype=dtype,
    )


def build_ullava_core(
    model_cfg, tokenizer, dtype=jnp.bfloat16, rng: Optional[jax.Array] = None
) -> Tuple[ullava_core.UllavaCoreConfig, Dict[str, Any]]:
    """Stage-1 model from config (reference `train_ullava_core.py:65-140`)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    llm_path = model_cfg.get("llm_path")
    vision_path = model_cfg.get("vision_encoder")

    if llm_path and os.path.isdir(llm_path):
        llm_cfg = _llama_cfg_from_hf(llm_path, dtype)
        llm_params = convert_llama(load_state_dict(llm_path), llm_cfg.num_layers, dtype)
    else:
        logger.warning("llm_path missing; random-initializing a tiny LLaMA")
        llm_cfg = llama.LlamaConfig.tiny(vocab_size=max(len(tokenizer), 160))
        llm_params = llama.init_params(rng, llm_cfg)

    if vision_path and os.path.isdir(vision_path):
        vis_cfg = _clip_cfg_from_hf(vision_path, dtype)
        vis_params = convert_clip_vision(
            load_state_dict(vision_path), vis_cfg.num_layers, dtype
        )
    else:
        logger.warning("vision_encoder missing; random-initializing a tiny CLIP")
        vis_cfg = clip_vit.CLIPVisionConfig.tiny()
        vis_params = clip_vit.init_params(jax.random.fold_in(rng, 1), vis_cfg)

    # Multimodal tokens: patch tokens plain, start/end mean-initialized.
    llm_params, mm_ids = tools.multi_modal_resize_token_embedding(
        MM_TOKEN_MAP, tokenizer, llm_params
    )
    import dataclasses

    llm_cfg = dataclasses.replace(llm_cfg, vocab_size=llm_params["embed_tokens"].shape[0])

    # Serving knob: model.kv_cache: 'int8' stores the decode KV cache
    # quantized (fused dequantizing decode-attention kernel on TPU).
    if model_cfg.get("kv_cache") == "int8":
        llm_cfg = dataclasses.replace(llm_cfg, kv_quant=True)

    cfg = ullava_core.UllavaCoreConfig(
        llm=llm_cfg,
        vision=vis_cfg,
        vision_hidden_layer=int(model_cfg.get("vision_hidden_layer", -2)),
        projector_type=model_cfg.get("projector_type", "mlp"),
        projector_from_scratch=bool(model_cfg.get("projector_from_scratch", True)),
        img_start_id=mm_ids["IMG_START"],
        img_end_id=mm_ids["IMG_END"],
        vid_start_id=mm_ids["VID_START"],
        vid_end_id=mm_ids["VID_END"],
        n_frm=int(model_cfg.get("n_frm", 8)),
    )
    proj_params = projector.init_vision_projector(
        jax.random.fold_in(rng, 2), vis_cfg.hidden_size, llm_cfg.hidden_size,
        cfg.projector_type, dtype=dtype,
    )
    params = {"llm": llm_params, "vision": vis_params, "projector": proj_params}

    core_ckpt = model_cfg.get("pretrained_core")
    if core_ckpt and os.path.isdir(core_ckpt):
        from ullava_tpu.training.checkpoint import restore_checkpoint

        params = restore_checkpoint(core_ckpt, params)

    # Serving-side MXU alignment: model.pad_vocab_multiple (e.g. 128)
    # zero-pads the resized (32007-token) tables; the real vocabulary is
    # cfg.llm.vocab_size / len(tokenizer) and callers thread it into
    # GenerateConfig.vocab_size to mask pad logits.
    pad_mult = int(model_cfg.get("pad_vocab_multiple", 0) or 0)
    if pad_mult > 1:
        from ullava_tpu.models.tools import pad_vocab_to_multiple

        params["llm"], _ = pad_vocab_to_multiple(params["llm"], pad_mult)
    return cfg, params


def build_ullava(
    model_cfg, tokenizer, dtype=jnp.bfloat16, rng: Optional[jax.Array] = None
) -> Tuple[ullava.UllavaConfig, Dict[str, Any]]:
    """Stage-2 model (reference `train_ullava.py:147-261`)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    core_cfg, core_params = build_ullava_core(model_cfg, tokenizer, dtype, rng)

    # stage-2 tokens with mean-init embeddings
    core_params["llm"], _ = tools.smart_resize_token_embedding(
        [DEFAULT_SEG_TOKEN, DEFAULT_LOC_TOKEN, DEFAULT_TAG_START, DEFAULT_TAG_END],
        tokenizer, core_params["llm"],
    )
    import dataclasses

    core_cfg = dataclasses.replace(
        core_cfg,
        llm=dataclasses.replace(
            core_cfg.llm, vocab_size=core_params["llm"]["embed_tokens"].shape[0]
        ),
    )

    sam_path = model_cfg.get("sam_path")
    if sam_path and os.path.exists(sam_path):
        sam_cfg = sam_vit_h(dtype=dtype)
        sam_params = convert_sam(load_state_dict(sam_path), sam_cfg, dtype)
    else:
        logger.warning("sam_path missing; random-initializing a tiny SAM")
        sam_cfg = SamConfig.tiny()
        sam_params = init_sam_params(jax.random.fold_in(rng, 3), sam_cfg)

    out_dim = sam_cfg.decoder.embed_dim  # 256 for ViT-H, matches reference
    cfg = ullava.UllavaConfig(
        core=core_cfg,
        sam=sam_cfg,
        seg_token_idx=tokenizer.convert_tokens_to_ids(DEFAULT_SEG_TOKEN),
        loc_token_idx=tokenizer.convert_tokens_to_ids(DEFAULT_LOC_TOKEN),
        out_dim=out_dim,
        ce_weight=float(model_cfg.get("ce_weight", 1.0)),
        bce_weight=float(model_cfg.get("bce_weight", 2.0)),
        dice_weight=float(model_cfg.get("dice_weight", 0.5)),
        l1_weight=float(model_cfg.get("l1_weight", 1.0)),
        giou_weight=float(model_cfg.get("iou_weight", 1.0)),
        mask_loss_frame=min(
            int(model_cfg.get("mask_loss_frame", 1024)), sam_cfg.vision.img_size
        ),
    )
    D = core_cfg.llm.hidden_size
    params = {
        "core": core_params,
        "sam": sam_params,
        "seg_projector": projector.init_text_head(jax.random.fold_in(rng, 4), D, out_dim),
        "det_projector": projector.init_text_head(jax.random.fold_in(rng, 5), D, out_dim),
        "det_decoder": projector.init_box_decoder(jax.random.fold_in(rng, 6), out_dim),
    }

    full_ckpt = model_cfg.get("pretrained_ullava")
    if full_ckpt and os.path.isdir(full_ckpt):
        from ullava_tpu.training.checkpoint import restore_checkpoint

        params = restore_checkpoint(full_ckpt, params)

    # Serving quantization: model.quantize: 'int8' | 'int8_towers' | none.
    # 'int8' also quantizes the LLM (required to fit the full stack on a
    # 16 GB chip; decode is bandwidth-bound so it is also faster);
    # 'int8_towers' quantizes only the frozen SAM/CLIP encoders.
    quant_mode = model_cfg.get("quantize")
    if quant_mode in ("int8", "int8_towers"):
        from ullava_tpu.ops import quant

        params["sam"]["image_encoder"] = quant.quantize_tree(
            params["sam"]["image_encoder"], quant.SAM_ENCODER_QUANT_KEYS
        )
        params["core"]["vision"] = quant.quantize_tree(
            params["core"]["vision"], quant.CLIP_QUANT_KEYS
        )
        if quant_mode == "int8":
            params["core"]["llm"] = quant.quantize_tree(
                params["core"]["llm"], quant.LLAMA_QUANT_KEYS
            )

    lora_r = int(model_cfg.get("lora_r", -1))
    if lora_r > 0:
        import dataclasses as dc

        scale = float(model_cfg.get("lora_alpha", 16)) / lora_r
        cfg = dc.replace(cfg, core=dc.replace(
            cfg.core, llm=dc.replace(cfg.core.llm, lora_scale=scale)
        ))
        params["core"]["llm"] = llama.add_lora(
            params["core"]["llm"], cfg.core.llm, jax.random.fold_in(rng, 7), r=lora_r
        )

    pad_mult = int(model_cfg.get("pad_vocab_multiple", 0) or 0)
    if pad_mult > 1:
        from ullava_tpu.models.tools import pad_vocab_to_multiple

        params["core"]["llm"], _ = pad_vocab_to_multiple(
            params["core"]["llm"], pad_mult
        )
    return cfg, params


# Registered arch names — the YAML `model.arch` vocabulary
# (reference AutoModel registrations `models/ullava_core.py:398-399`,
# `models/ullava.py:437-438`).
from ullava_tpu.registry import registry as _registry  # noqa: E402


@_registry.register_model("ullava_core")
class UllavaCoreArch:
    config_cls = ullava_core.UllavaCoreConfig
    build = staticmethod(build_ullava_core)


@_registry.register_model("ullava")
class UllavaArch:
    config_cls = ullava.UllavaConfig
    build = staticmethod(build_ullava)
