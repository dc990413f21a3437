"""COCO run-length-encoding codec (pycocotools replacement).

The reference depends on pycocotools' C extension for RLE decode and
mask->bbox (`/root/reference/dataset/datasets/res_dataset.py:11`,
`sem_seg_dataset.py:12`, `dataset/tools/mask_toolbox.py:3`). This module
reimplements the needed subset in numpy + cv2 (no C build required;
a native drop-in can replace hot loops later):

- `decode`: compressed (LEB128-style char string) or uncompressed RLE ->
  binary mask (column-major runs, exactly COCO's layout);
- `encode`: binary mask -> compressed RLE;
- `fr_poly`: polygon(s) -> RLE via rasterization;
- `area`, `to_bbox`: RLE stats.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, Union[Sequence[int], bytes, str, Sequence[Sequence[int]]]]


def _counts_from_leb(s: bytes) -> List[int]:
    """COCO compressed counts: 6-bit varint with sign-extended deltas."""
    counts: List[int] = []
    i = 0
    prev2 = prev1 = 0  # counts[-2] reference for delta coding
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _counts_to_leb(counts: Sequence[int]) -> bytes:
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x = int(x) - int(counts[i - 2])
        else:
            x = int(x)
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            if c & 0x10:
                more = x != -1
            else:
                more = x != 0
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _norm_counts(rle: RLE) -> List[int]:
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, (bytes, bytearray)):
        return _counts_from_leb(bytes(counts))
    return [int(c) for c in counts]


def decode(rles: Union[RLE, Sequence[RLE]]) -> np.ndarray:
    """RLE(s) -> uint8 mask [H, W] or [H, W, N] (pycocotools layout).
    Compressed RLEs take the native C path when the library is built."""
    from ullava_tpu.data.tools import native

    single = isinstance(rles, dict)
    rle_list = [rles] if single else list(rles)
    masks = []
    for r in rle_list:
        h, w = r["size"]
        counts_raw = r["counts"]
        if isinstance(counts_raw, str):
            counts_raw = counts_raw.encode()
        if isinstance(counts_raw, (bytes, bytearray)):
            m = native.rle_decode(bytes(counts_raw), h, w)
            if m is not None:
                masks.append(m)
                continue
        counts = _norm_counts(r)
        flat = np.zeros(h * w, np.uint8)
        pos = 0
        val = 0
        for c in counts:
            if val:
                flat[pos : pos + c] = 1
            pos += c
            val ^= 1
        masks.append(flat.reshape(w, h).T)  # column-major runs
    out = np.stack(masks, axis=-1)
    return out[..., 0] if single else out


def encode(mask: np.ndarray) -> RLE:
    """uint8 [H, W] mask -> compressed RLE."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).T.reshape(-1)  # column-major
    # run lengths, starting with a (possibly zero-length) run of zeros
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        runs = [0] + runs
    if not flat.size:
        runs = [0]
    return {"size": [h, w], "counts": _counts_to_leb(runs)}


def fr_poly(polys: Sequence[Sequence[float]], h: int, w: int) -> List[RLE]:
    """Polygon(s) [x0,y0,x1,y1,...] -> per-polygon RLEs (frPyObjects)."""
    import cv2

    out = []
    for poly in polys:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        canvas = np.zeros((h, w), np.uint8)
        # pycocotools rasterizes with its own integer scheme; fillPoly on
        # rounded vertices matches to within boundary pixels.
        cv2.fillPoly(canvas, [np.round(pts).astype(np.int32)], 1)
        out.append(encode(canvas))
    return out


def merge(rles: Sequence[RLE]) -> np.ndarray:
    """Union of multiple RLEs as a decoded mask (the reference's
    `np.sum(m, axis=2)` usage)."""
    m = decode(list(rles))
    return (m.sum(axis=-1) > 0).astype(np.uint8)


def area(rle: RLE) -> int:
    counts = _norm_counts(rle)
    return int(sum(counts[1::2]))


def to_bbox(rle: RLE) -> np.ndarray:
    """RLE -> [x, y, w, h] (pycocotools toBbox semantics)."""
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return np.zeros(4, np.float64)
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return np.asarray([x0, y0, x1 - x0 + 1, y1 - y0 + 1], np.float64)
