"""SamPredictor equivalent: embed an image once, prompt many times.

Completeness parity with the reference's vendored
`models/segment_anything/predictor.py` (unused by the train/eval paths
but part of the public SAM surface): `set_image` caches the encoder
embedding; `predict` runs point/box/mask prompts through the prompt
encoder + mask decoder, returning masks at the original resolution with
IoU predictions. Prompt encoding + decoding are jit-compiled once per
prompt shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ullava_tpu.data.tools.mask_toolbox import SegToolBox, get_preprocess_shape
from ullava_tpu.models.sam import build as sam_build
from ullava_tpu.models.sam import image_encoder, mask_decoder, prompt_encoder


class SamPredictor:
    def __init__(self, params, cfg: sam_build.SamConfig):
        self.params = params
        self.cfg = cfg
        self.seg_tool = SegToolBox(sam_size=cfg.vision.img_size)
        self._embedding = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None
        self._encode = jax.jit(lambda p, x: image_encoder.encode(p, cfg.vision, x))
        self._decode = jax.jit(
            lambda p, emb, sparse, dense: mask_decoder.decode_masks(
                p["mask_decoder"], cfg.decoder, emb,
                prompt_encoder.dense_positional_embedding(p["prompt_encoder"], cfg.prompt),
                sparse, dense, multimask_output=True,
            )
        )

    def set_image(self, image: np.ndarray) -> None:
        """image: RGB uint8 [H, W, 3]."""
        self.original_size = image.shape[:2]
        resized = self.seg_tool.apply_image(image)
        self.input_size = resized.shape[:2]
        pre = self.seg_tool.preprocess(resized)
        self._embedding = self._encode(self.params["image_encoder"], pre[None])

    def _scale_coords(self, coords: np.ndarray) -> np.ndarray:
        oh, ow = self.original_size
        nh, nw = get_preprocess_shape(oh, ow, self.cfg.vision.img_size)
        out = np.asarray(coords, np.float32).copy()
        out[..., 0] *= nw / ow
        out[..., 1] *= nh / oh
        return out

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,  # [N, 2] (x, y) pixels
        point_labels: Optional[np.ndarray] = None,  # [N] 1 fg / 0 bg
        box: Optional[np.ndarray] = None,  # [4] xyxy pixels
        multimask_output: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (masks [M, H, W] bool, iou_predictions [M],
        low_res_logits [M, 4g, 4g])."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        points = None
        if point_coords is not None:
            points = (
                jnp.asarray(self._scale_coords(point_coords))[None],
                jnp.asarray(np.asarray(point_labels, np.int32))[None],
            )
        boxes = None
        if box is not None:
            boxes = jnp.asarray(
                self._scale_coords(np.asarray(box, np.float32).reshape(2, 2)).reshape(1, 1, 4)
            )
        sparse, dense = prompt_encoder.encode_prompts(
            self.params["prompt_encoder"], self.cfg.prompt, batch=1,
            points=points, boxes=boxes,
        )
        low_res, iou = self._decode(self.params, self._embedding, sparse, dense)
        low_res = np.asarray(low_res[0])
        iou = np.asarray(iou[0])
        if not multimask_output:
            low_res, iou = low_res[:1], iou[:1]
        masks = sam_build.postprocess_masks_host(
            low_res, input_size=self.input_size, original_size=self.original_size,
            img_size=self.cfg.vision.img_size,
        )
        return masks > 0, iou, low_res
