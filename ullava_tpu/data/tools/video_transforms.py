"""Video tensor transform primitives (host-side numpy).

Inventory parity with `/root/reference/dataset/tools/functional_video.py`
and `transforms_video.py`: crop / resize / resized-crop / center-crop /
normalize / horizontal-flip over [T, H, W, C] clips, plus the composable
transform classes the processors build on. THWC float layout throughout
(the reference's CTHW tensors become channel-last for TPU transfer).
"""

from __future__ import annotations

import random
from typing import Sequence, Tuple

import numpy as np
from PIL import Image


def crop(clip: np.ndarray, i: int, j: int, h: int, w: int) -> np.ndarray:
    return clip[:, i : i + h, j : j + w]


def resize(clip: np.ndarray, target_size: Tuple[int, int],
           interpolation=Image.BILINEAR) -> np.ndarray:
    th, tw = target_size
    out = [
        np.asarray(Image.fromarray(np.asarray(f)).resize((tw, th), interpolation))
        for f in clip.astype(np.uint8)
    ] if clip.dtype == np.uint8 else None
    if out is None:
        # float clips: per-frame PIL resize on a scaled uint8 proxy loses
        # precision; use simple bilinear via PIL 'F' mode per channel.
        T, H, W, C = clip.shape
        res = np.empty((T, th, tw, C), np.float32)
        for t in range(T):
            for c in range(C):
                img = Image.fromarray(clip[t, :, :, c].astype(np.float32), mode="F")
                res[t, :, :, c] = np.asarray(img.resize((tw, th), interpolation))
        return res
    return np.stack(out)


def resized_crop(clip: np.ndarray, i: int, j: int, h: int, w: int,
                 size: Tuple[int, int], interpolation=Image.BICUBIC) -> np.ndarray:
    return resize(crop(clip, i, j, h, w), size, interpolation)


def center_crop(clip: np.ndarray, crop_size: Tuple[int, int]) -> np.ndarray:
    th, tw = crop_size
    h, w = clip.shape[1:3]
    i = (h - th) // 2
    j = (w - tw) // 2
    return crop(clip, i, j, th, tw)


def normalize(clip: np.ndarray, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    x = clip.astype(np.float32)
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def hflip(clip: np.ndarray) -> np.ndarray:
    return clip[:, :, ::-1]


def to_float(clip: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float [0,1] (ToTensorVideo equivalent, THWC)."""
    return clip.astype(np.float32) / 255.0


class RandomCropVideo:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        th, tw = self.size
        h, w = clip.shape[1:3]
        i = random.randint(0, h - th)
        j = random.randint(0, w - tw)
        return crop(clip, i, j, th, tw)


class CenterCropVideo:
    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        return center_crop(clip, self.size)


class NormalizeVideo:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        return normalize(clip, self.mean, self.std)


class RandomHorizontalFlipVideo:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, clip: np.ndarray) -> np.ndarray:
        return hflip(clip) if random.random() < self.p else clip
