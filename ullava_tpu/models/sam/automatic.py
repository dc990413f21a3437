"""Automatic mask generation (SamAutomaticMaskGenerator equivalent).

Completeness parity with the reference's vendored
`models/segment_anything/automatic_mask_generator.py` + `amg.py`: a point
grid swept over the image, masks decoded for every point in ONE batched
jit call (the reference loops per-batch on GPU), filtered by predicted
IoU and stability score, then deduplicated by mask-IoU NMS.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ullava_tpu.data.tools import rle as rle_codec
from ullava_tpu.data.tools.mask_toolbox import SegToolBox
from ullava_tpu.models.sam import build as sam_build
from ullava_tpu.models.sam import image_encoder, mask_decoder, prompt_encoder


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced grid in [0,1]^2 (cell centers)."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side)
    xx, yy = np.meshgrid(coords, coords)
    return np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def stability_score(logits: np.ndarray, offset: float = 1.0) -> np.ndarray:
    """IoU between thresholded masks at +/- offset around 0."""
    high = (logits > offset).sum(axis=(-2, -1))
    low = (logits > -offset).sum(axis=(-2, -1))
    return high / np.maximum(low, 1)


def mask_iou_matrix(masks: np.ndarray) -> np.ndarray:
    flat = masks.reshape(masks.shape[0], -1).astype(np.float64)
    inter = flat @ flat.T
    areas = flat.sum(-1)
    union = areas[:, None] + areas[None, :] - inter
    return inter / np.maximum(union, 1)


class SamAutomaticMaskGenerator:
    def __init__(
        self,
        params,
        cfg: sam_build.SamConfig,
        points_per_side: int = 16,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.92,
        nms_iou_thresh: float = 0.7,
        min_mask_area: int = 16,
    ):
        self.params = params
        self.cfg = cfg
        self.grid = build_point_grid(points_per_side)
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.nms_iou_thresh = nms_iou_thresh
        self.min_mask_area = min_mask_area
        self.seg_tool = SegToolBox(sam_size=cfg.vision.img_size)

        def decode_all(p, emb, pts, labels):
            N = pts.shape[0]
            sparse, dense = prompt_encoder.encode_prompts(
                p["prompt_encoder"], cfg.prompt, batch=N,
                points=(pts[:, None, :], labels[:, None]),
            )
            pe = prompt_encoder.dense_positional_embedding(p["prompt_encoder"], cfg.prompt)
            emb_rep = jnp.broadcast_to(emb, (N,) + emb.shape[1:])
            return mask_decoder.decode_masks(
                p["mask_decoder"], cfg.decoder, emb_rep, pe, sparse, dense,
                multimask_output=True,
            )

        self._encode = jax.jit(lambda p, x: image_encoder.encode(p, cfg.vision, x))
        self._decode_all = jax.jit(decode_all)

    def generate(self, image: np.ndarray) -> List[Dict]:
        """image: RGB uint8. Returns list of dicts with 'segmentation'
        (RLE), 'area', 'bbox' (xywh), 'predicted_iou', 'stability_score',
        'point_coords' — the pycocotools-style output schema."""
        oh, ow = image.shape[:2]
        resized = self.seg_tool.apply_image(image)
        input_size = resized.shape[:2]
        emb = self._encode(
            self.params["image_encoder"], self.seg_tool.preprocess(resized)[None]
        )

        pts = self.grid.copy()
        pts[:, 0] *= input_size[1]
        pts[:, 1] *= input_size[0]
        labels = np.ones(len(pts), np.int32)

        low_res, iou = self._decode_all(
            self.params, emb, jnp.asarray(pts, jnp.float32), jnp.asarray(labels)
        )
        low_res = np.asarray(low_res).reshape(-1, *low_res.shape[2:])  # [N*3, h, w]
        iou = np.asarray(iou).reshape(-1)
        point_idx = np.repeat(np.arange(len(pts)), 3)

        keep = iou > self.pred_iou_thresh
        stab = stability_score(low_res)
        keep &= stab > self.stability_score_thresh
        if not keep.any():
            return []
        low_res, iou, stab, point_idx = (
            low_res[keep], iou[keep], stab[keep], point_idx[keep]
        )

        masks = []
        for lr in low_res:
            m = sam_build.postprocess_masks_host(
                lr[None], input_size=input_size, original_size=(oh, ow),
                img_size=self.cfg.vision.img_size,
            )[0]
            masks.append(m > 0)
        masks = np.stack(masks)

        areas = masks.sum(axis=(1, 2))
        big = areas >= self.min_mask_area
        masks, iou, stab, areas, point_idx = (
            masks[big], iou[big], stab[big], areas[big], point_idx[big]
        )
        if len(masks) == 0:
            return []

        # Greedy NMS by mask IoU, highest predicted IoU first.
        order = np.argsort(-iou)
        iou_mat = mask_iou_matrix(masks)
        keep_idx: List[int] = []
        for i in order:
            if all(iou_mat[i, j] < self.nms_iou_thresh for j in keep_idx):
                keep_idx.append(int(i))

        out = []
        for i in keep_idx:
            ys, xs = np.nonzero(masks[i])
            bbox = [float(xs.min()), float(ys.min()),
                    float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)]
            out.append({
                "segmentation": rle_codec.encode(masks[i].astype(np.uint8)),
                "area": int(areas[i]),
                "bbox": bbox,
                "predicted_iou": float(iou[i]),
                "stability_score": float(stab[i]),
                "point_coords": [pts[point_idx[i]].tolist()],
            })
        return out
