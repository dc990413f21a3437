"""uLLaVA stage-2 model: core MLLM + SAM seg head + MLP grounding head.

TPU-native redesign of `/root/reference/models/ullava.py:69-333`:

- SAM image embeddings computed batched (the reference's per-image Python
  loop + `torch.cuda.empty_cache()` becomes one fixed-shape call) with
  `stop_gradient` (encoder frozen; only the mask decoder trains).
- `[SEG]`/`[LOC]` readout: the reference masks `input_ids[:, 1:]` and
  gathers ragged per-sample lists (`models/ullava.py:168-230`); here the
  gather is fixed-shape — up to `max_masks`/`max_boxes` occurrences per
  sample with validity masks (train datasets emit <=3 sentences,
  `res_dataset.py:20`).
- Mask losses computed on the padded SAM frame with per-sample valid-pixel
  crops (static shapes) instead of per-sample original-resolution
  interpolation; eval uses the exact host-side postprocess
  (`sam/build.py:postprocess_masks_host`) for metric parity.
- Loss weights/defaults: ce 1.0, bce 2.0, dice 0.5, l1 1.0, giou 1.0
  (`models/ullava.py:22-31`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ullava_tpu.constants import DEFAULT_LOC_TOKEN_IDX, DEFAULT_SEG_TOKEN_IDX
from ullava_tpu.models import projector, ullava_core
from ullava_tpu.models import loss as L
from ullava_tpu.models.sam import build as sam_build
from ullava_tpu.models.sam import image_encoder as sam_image_encoder

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UllavaConfig:
    core: ullava_core.UllavaCoreConfig = dataclasses.field(
        default_factory=ullava_core.UllavaCoreConfig
    )
    sam: sam_build.SamConfig = dataclasses.field(default_factory=sam_build.SamConfig)
    seg_token_idx: int = DEFAULT_SEG_TOKEN_IDX
    loc_token_idx: int = DEFAULT_LOC_TOKEN_IDX
    out_dim: int = 256
    ce_weight: float = 1.0
    bce_weight: float = 2.0
    dice_weight: float = 0.5
    l1_weight: float = 1.0
    giou_weight: float = 1.0
    max_masks: int = 3
    max_boxes: int = 3
    # Resolution at which mask losses are evaluated (SAM frame scale).
    mask_loss_frame: int = 1024

    @classmethod
    def tiny(cls, **kw) -> "UllavaConfig":
        core = ullava_core.UllavaCoreConfig.tiny()
        defaults = dict(
            core=core,
            sam=sam_build.SamConfig.tiny(),
            seg_token_idx=154,
            loc_token_idx=155,
            out_dim=16,
            mask_loss_frame=64,
        )
        defaults.update(kw)
        return cls(**defaults)


def init_params(rng: jax.Array, cfg: UllavaConfig) -> Params:
    k = jax.random.split(rng, 5)
    D = cfg.core.llm.hidden_size
    return {
        "core": ullava_core.init_params(k[0], cfg.core),
        "sam": sam_build.init_sam_params(k[1], cfg.sam),
        "seg_projector": projector.init_text_head(k[2], D, cfg.out_dim),
        "det_projector": projector.init_text_head(k[3], D, cfg.out_dim),
        "det_decoder": projector.init_box_decoder(k[4], cfg.out_dim),
    }


def get_visual_embs(params: Params, cfg: UllavaConfig, images_sam: jax.Array) -> jax.Array:
    """SAM image embeddings [B, g, g, 256]; encoder frozen (stop_gradient
    replaces the reference's requires_grad=False + per-image no-grad loop)."""
    emb = sam_image_encoder.encode(
        params["sam"]["image_encoder"], cfg.sam.vision, images_sam
    )
    return jax.lax.stop_gradient(emb)


def _token_readout(
    input_ids: jax.Array,  # [B, S]
    hidden: jax.Array,  # [B, S, D] final-layer hidden states
    attn_lens: Optional[jax.Array],
    token_idx: int,
    max_tokens: int,
):
    """Fixed-shape [SEG]/[LOC] readout: token at position p reads
    hidden[p-1] (reference `input_ids[:, 1:]` mask alignment)."""
    B, S = input_ids.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    valid = (input_ids == token_idx) & (pos >= 1)
    if attn_lens is not None:
        valid &= pos < attn_lens[:, None]
    key = jnp.where(valid, pos, S + 1)
    order = jnp.argsort(key, axis=1)[:, :max_tokens]
    picked_valid = jnp.take_along_axis(valid, order, axis=1)
    h = jnp.take_along_axis(hidden, jnp.maximum(order - 1, 0)[..., None], axis=1)
    return h, picked_valid


def forward(
    params: Params,
    cfg: UllavaConfig,
    *,
    input_ids: jax.Array,  # [B, S]
    labels: Optional[jax.Array],  # [B, S] (None at inference)
    attn_lens: jax.Array,  # [B]
    images: jax.Array,  # [B, 224, 224, 3] CLIP input
    images_sam: jax.Array,  # [B, 1024, 1024, 3] SAM input (normalized+padded)
    gt_masks: Optional[jax.Array] = None,  # [B, M, F, F] at mask_loss_frame
    mask_valid: Optional[jax.Array] = None,  # [B, M]
    gt_boxes: Optional[jax.Array] = None,  # [B, Nb, 4] pad-normalized xyxy
    box_valid: Optional[jax.Array] = None,  # [B, Nb]
    input_hw: Optional[jax.Array] = None,  # [B, 2] pre-pad resized size
    inference: bool = False,
) -> Dict[str, Any]:
    B = input_ids.shape[0]
    F = cfg.mask_loss_frame

    image_embeddings = get_visual_embs(params, cfg, images_sam)

    core_out = ullava_core.forward(
        params["core"], cfg.core,
        input_ids=input_ids, labels=labels, images=images, attn_lens=attn_lens,
    )
    hidden = core_out["hidden_states"]

    seg_h, seg_valid = _token_readout(
        input_ids, hidden, attn_lens, cfg.seg_token_idx, cfg.max_masks
    )
    loc_h, loc_valid = _token_readout(
        input_ids, hidden, attn_lens, cfg.loc_token_idx, cfg.max_boxes
    )

    seg_embeds = projector.apply_text_head(
        params["seg_projector"], seg_h.astype(jnp.float32)
    )  # [B, M, out_dim]
    loc_embeds = projector.apply_text_head(
        params["det_projector"], loc_h.astype(jnp.float32)
    )
    pred_boxes = projector.apply_box_decoder(params["det_decoder"], loc_embeds)

    low_res_masks, iou_pred = sam_build.forward_masks(
        params["sam"], cfg.sam, image_embeddings, seg_embeds, multimask_output=False
    )  # [B, M, 4g, 4g]
    pred_masks = sam_build.upscale_masks_to_frame(low_res_masks, F)

    # Valid-pixel region: the un-padded part of the SAM frame, scaled to F.
    pixel_valid = None
    if input_hw is not None:
        img_size = cfg.sam.vision.img_size
        hw = input_hw.astype(jnp.float32) * (F / img_size)
        r = jax.lax.broadcasted_iota(jnp.int32, (B, F, F), 1).astype(jnp.float32)
        c = jax.lax.broadcasted_iota(jnp.int32, (B, F, F), 2).astype(jnp.float32)
        pixel_valid = (r < hw[:, 0:1, None]) & (c < hw[:, 1:2, None])

    out: Dict[str, Any] = {
        "pred_masks": pred_masks,
        "low_res_masks": low_res_masks,
        "pred_boxes": pred_boxes,
        "seg_valid": seg_valid,
        "loc_valid": loc_valid,
        "iou_pred": iou_pred,
        "logits": core_out["logits"],
    }
    if inference or labels is None:
        return out

    ce_loss = cfg.ce_weight * core_out["loss"]
    m_valid = seg_valid if mask_valid is None else (seg_valid & mask_valid)
    b_valid = loc_valid if box_valid is None else (loc_valid & box_valid)

    gt_m = gt_masks if gt_masks is not None else jnp.zeros_like(pred_masks)
    gt_b = gt_boxes if gt_boxes is not None else jnp.zeros_like(pred_boxes)

    mask_bce = cfg.bce_weight * L.sigmoid_ce_loss(pred_masks, gt_m, m_valid, pixel_valid)
    mask_dice = cfg.dice_weight * L.dice_loss(pred_masks, gt_m, m_valid, pixel_valid)
    box_l1 = cfg.l1_weight * L.bbox_l1_loss(pred_boxes, gt_b, b_valid)
    box_giou = cfg.giou_weight * L.bbox_giou_loss(pred_boxes, gt_b, b_valid)

    mask_loss = mask_bce + mask_dice
    bbox_loss = box_l1 + box_giou
    out.update(
        loss=ce_loss + mask_loss + bbox_loss,
        ce_loss=ce_loss,
        mask_bce_loss=mask_bce,
        mask_dice_loss=mask_dice,
        mask_loss=mask_loss,
        bbox_loss=bbox_loss,
    )
    return out


def evaluate(
    params: Params,
    cfg: UllavaConfig,
    gen_cfg,
    *,
    input_ids: jax.Array,
    prompt_lens: jax.Array,
    images: jax.Array,
    images_sam: jax.Array,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Generation + [SEG]/[LOC] decode (reference `evaluate:335-434`):
    generate, read hidden states that produced each [SEG]/[LOC] token,
    run SAM / box heads. Returns low-res masks; callers postprocess to
    original sizes host-side."""
    from ullava_tpu.models import generate as gen_mod

    gen_out = gen_mod.generate(
        params["core"], cfg.core, gen_cfg,
        input_ids=input_ids, prompt_lens=prompt_lens, images=images, rng=rng,
    )
    seqs, hidden, lengths = (
        gen_out["sequences"], gen_out["hidden_last"], gen_out["lengths"],
    )

    seg_h, seg_valid = gen_mod.readout_token_hidden(
        seqs, hidden, lengths, cfg.seg_token_idx, cfg.max_masks
    )
    loc_h, loc_valid = gen_mod.readout_token_hidden(
        seqs, hidden, lengths, cfg.loc_token_idx, cfg.max_boxes
    )

    seg_embeds = projector.apply_text_head(params["seg_projector"], seg_h.astype(jnp.float32))
    loc_embeds = projector.apply_text_head(params["det_projector"], loc_h.astype(jnp.float32))
    pred_boxes = projector.apply_box_decoder(params["det_decoder"], loc_embeds)

    image_embeddings = get_visual_embs(params, cfg, images_sam)
    low_res_masks, iou_pred = sam_build.forward_masks(
        params["sam"], cfg.sam, image_embeddings, seg_embeds, multimask_output=False
    )
    return {
        "sequences": seqs,
        "lengths": lengths,
        "low_res_masks": low_res_masks,
        "pred_boxes": pred_boxes,
        "seg_valid": seg_valid,
        "loc_valid": loc_valid,
        "iou_pred": iou_pred,
    }
