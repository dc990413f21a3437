"""Segmentation and grounding losses.

Matches the reference formulas (`/root/reference/models/loss.py`) including
the dice `scale=1000` numerator/denominator trick and the degenerate-box
filter in the giou loss — but reworked for fixed shapes: masks arrive as
dense [B, M, H, W] tensors with per-mask validity and a per-sample valid
pixel region, replacing the reference's ragged per-sample lists.

Aggregation parity (`models/ullava.py:271-324`): per-mask pixel-mean (bce)
/ dice-per-mask, summed over all valid masks in the batch, divided by
(total valid masks + 1e-8). Box losses are DOUBLE-normalized, exactly like
the reference: each sample's coordinate-error sum is divided by that
sample's box count (`bbox_l1_loss(..., gt_box.shape[0])` inside the
per-sample loop, `models/ullava.py:311-313`), and the sum of those
per-sample means is divided by the total box count again
(`models/ullava.py:319-320`). The mask losses multiply the per-sample term
by `gt_mask.shape[0]` first, which cancels the inner divide; the box
losses do not — the asymmetry is the reference's trained objective, so we
keep it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def box_area(boxes: jax.Array) -> jax.Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jax.Array, boxes2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Element-wise IoU for aligned boxes [..., 4] xyxy."""
    area1, area2 = box_area(boxes1), box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-12), union


def generalized_box_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Element-wise GIoU for aligned boxes (diagonal of the reference's
    pairwise matrix, `loss.py:102-114` usage)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-12)


def dice_loss(
    pred_logits: jax.Array,  # [B, M, H, W]
    gt_masks: jax.Array,  # [B, M, H, W] in {0, 1}
    mask_valid: jax.Array,  # [B, M] bool
    pixel_valid: Optional[jax.Array] = None,  # [B, H, W] bool
    scale: float = 1000.0,
    eps: float = 1e-6,
) -> jax.Array:
    """Sum over valid masks of (1 - dice), / (num_valid + 1e-8)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = gt_masks.astype(jnp.float32)
    if pixel_valid is not None:
        pv = pixel_valid[:, None].astype(jnp.float32)
        p = p * pv
        t = t * pv
    num = 2.0 * jnp.sum(p / scale * t, axis=(-2, -1))
    den = jnp.sum(p / scale, axis=(-2, -1)) + jnp.sum(t / scale, axis=(-2, -1))
    per_mask = 1.0 - (num + eps) / (den + eps)
    per_mask = jnp.where(mask_valid, per_mask, 0.0)
    return per_mask.sum() / (mask_valid.sum() + 1e-8)


def sigmoid_ce_loss(
    pred_logits: jax.Array,  # [B, M, H, W]
    gt_masks: jax.Array,
    mask_valid: jax.Array,  # [B, M]
    pixel_valid: Optional[jax.Array] = None,  # [B, H, W]
) -> jax.Array:
    """Per-mask pixel-mean BCE, summed over valid masks / (count + 1e-8)."""
    x = pred_logits.astype(jnp.float32)
    t = gt_masks.astype(jnp.float32)
    per_pixel = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if pixel_valid is not None:
        pv = pixel_valid[:, None].astype(jnp.float32)
        per_mask = jnp.sum(per_pixel * pv, axis=(-2, -1)) / jnp.maximum(
            jnp.sum(pv, axis=(-2, -1)), 1.0
        )
    else:
        per_mask = per_pixel.mean(axis=(-2, -1))
    per_mask = jnp.where(mask_valid, per_mask, 0.0)
    return per_mask.sum() / (mask_valid.sum() + 1e-8)


def bbox_l1_loss(
    pred_boxes: jax.Array,  # [B, N, 4]
    gt_boxes: jax.Array,
    box_valid: jax.Array,  # [B, N]
) -> jax.Array:
    """Per-sample |err| sum / (n_b + 1e-8), summed, / (total + 1e-8).

    Double normalization matches the reference composition
    (`models/ullava.py:311,319` + `loss.py:96-99`); see module docstring.
    """
    l1 = jnp.abs(pred_boxes.astype(jnp.float32) - gt_boxes.astype(jnp.float32))
    l1 = jnp.where(box_valid[..., None], l1, 0.0)
    per_sample = l1.sum(axis=(-2, -1)) / (box_valid.sum(axis=-1) + 1e-8)
    return per_sample.sum() / (box_valid.sum() + 1e-8)


def bbox_giou_loss(
    pred_boxes: jax.Array,  # [B, N, 4]
    gt_boxes: jax.Array,
    box_valid: jax.Array,
) -> jax.Array:
    """Per-sample (1 - giou) sum over non-degenerate boxes / (n_b + 1e-8),
    summed over samples, / (total + 1e-8).

    Degenerate predictions (x2 < x1 or y2 < y1) are excluded from the sum
    but still counted in the denominators, exactly like the reference's
    filter (`loss.py:102-114`); double normalization matches
    `models/ullava.py:318,320` — see module docstring."""
    ok = jnp.all(pred_boxes[..., 2:] >= pred_boxes[..., :2], axis=-1) & box_valid
    giou = generalized_box_iou(pred_boxes.astype(jnp.float32), gt_boxes.astype(jnp.float32))
    per_box = jnp.where(ok, 1.0 - giou, 0.0)
    per_sample = per_box.sum(axis=-1) / (box_valid.sum(axis=-1) + 1e-8)
    return per_sample.sum() / (box_valid.sum() + 1e-8)
