"""CLIP image processor (host-side, torch/HF-free).

Behavioral parity with `/root/reference/dataset/processors/clip_processor.py`:
optional square padding with a WHITE (255,255,255) background (centered
paste), then the CLIPImageProcessor pipeline — resize shortest side to
`image_size` (bicubic), center crop, scale to [0,1], normalize with CLIP
mean/std. Output is NHWC float32 (TPU layout) instead of CHW torch.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
from PIL import Image

from ullava_tpu.constants import CLIP_MEAN, CLIP_STD, DEFAULT_IMAGE_SIZE
from ullava_tpu.registry import registry


@registry.register_processor("clip_image")
class CLIPProcessor:
    def __init__(self, image_size: int = DEFAULT_IMAGE_SIZE, aspect_ratio: Optional[str] = None):
        self.image_size = image_size
        self.aspect_ratio = aspect_ratio  # 'pad' | 'keep' | None
        self.mean = np.asarray(CLIP_MEAN, np.float32)
        self.std = np.asarray(CLIP_STD, np.float32)

    @staticmethod
    def pad_to_square(img: Image.Image, background_color=(255, 255, 255)) -> Image.Image:
        w, h = img.size
        if w == h:
            return img
        side = max(w, h)
        result = Image.new(img.mode, (side, side), background_color)
        result.paste(img, ((side - w) // 2, (side - h) // 2))
        return result

    def __call__(self, item: Union[Image.Image, np.ndarray]) -> np.ndarray:
        if isinstance(item, np.ndarray):
            item = Image.fromarray(item)
        if item.mode != "RGB":
            item = item.convert("RGB")
        if self.aspect_ratio == "pad":
            item = self.pad_to_square(item)

        # Resize shortest side -> image_size (bicubic), then center crop.
        w, h = item.size
        short = min(w, h)
        scale = self.image_size / short
        new_w, new_h = round(w * scale), round(h * scale)
        item = item.resize((new_w, new_h), Image.BICUBIC)
        left = (new_w - self.image_size) // 2
        top = (new_h - self.image_size) // 2
        item = item.crop((left, top, left + self.image_size, top + self.image_size))

        x = np.asarray(item, np.float32) / 255.0
        x = (x - self.mean) / self.std
        return x  # [H, W, 3] float32

    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        return cls(
            image_size=int(cfg.get("image_size", DEFAULT_IMAGE_SIZE)),
            aspect_ratio=cfg.get("aspect_ratio", None),
        )
