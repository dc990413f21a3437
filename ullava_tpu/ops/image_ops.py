"""On-device (XLA) image preprocessing for the serving path.

The reference preprocesses on the host: CLIP white square-pad + bicubic
resize + normalize (`/root/reference/dataset/processors/clip_processor.py:82-95`)
and SAM normalize + corner-pad (`/root/reference/dataset/tools/mask_toolbox.py:8-28`,
`models/segment_anything/modeling/sam.py` preprocess). On TPU, host-side
float preprocess is both a CPU bottleneck and 4x the H2D traffic (f32 vs
uint8). Here the host ships ONE shared uint8 canvas per image — the
JPEG-decoded frame resized so its longest side is `SAM_IMAGE_SIZE` and
placed at the top-left corner (exactly `SegToolBox.apply_image`) — and
everything downstream (white-pad, resize-to-224, both normalizations)
runs as XLA ops inside the serve program, where they fuse into the
surrounding graph.

Contract: `canvas` is uint8 NHWC `[B, 1024, 1024, 3]`; `sizes[b] = (h, w)`
is the valid (aspect-preserved) region, `max(h, w) == 1024`.

Divergence note: the reference pads/resizes CLIP inputs at the ORIGINAL
resolution; this path reuses the 1024-longest-side canvas, so CLIP sees
a twice-resized image (bilinear to 1024, then cubic to 224). Both are
aspect-preserving downsamples to 224 so the difference is sub-pixel
interpolation error; `tests/test_image_ops.py` pins it against the host
processors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.constants import (
    CLIP_MEAN,
    CLIP_STD,
    DEFAULT_IMAGE_SIZE,
    SAM_IMAGE_SIZE,
    SAM_MEAN,
    SAM_STD,
)


def valid_mask(sizes: jax.Array, side: int) -> jax.Array:
    """[B, 2] (h, w) -> [B, side, side, 1] f32 {0,1} mask of the valid region."""
    ih = jax.lax.broadcasted_iota(jnp.int32, (1, side, side, 1), 1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, side, side, 1), 2)
    h = sizes[:, 0].reshape(-1, 1, 1, 1)
    w = sizes[:, 1].reshape(-1, 1, 1, 1)
    return ((ih < h) & (iw < w)).astype(jnp.float32)


def sam_preprocess(canvas: jax.Array, sizes: jax.Array) -> jax.Array:
    """uint8 canvas -> SAM encoder input [B, 1024, 1024, 3] f32.

    Bit-parity with `SegToolBox.preprocess` (normalize the valid region,
    zero the corner padding)."""
    mean = jnp.asarray(SAM_MEAN, jnp.float32)
    std = jnp.asarray(SAM_STD, jnp.float32)
    x = (canvas.astype(jnp.float32) - mean) / std
    return x * valid_mask(sizes, canvas.shape[1])


def clip_preprocess(
    canvas: jax.Array,
    sizes: jax.Array,
    image_size: int = DEFAULT_IMAGE_SIZE,
) -> jax.Array:
    """uint8 canvas -> CLIP tower input [B, image_size, image_size, 3] f32.

    Mirrors the reference 'pad' pipeline on the canvas: fill outside the
    valid region with white, center the image (the reference's
    `pad_to_square` pastes centered), then antialiased cubic resize to
    `image_size` and CLIP-normalize."""
    side = canvas.shape[1]
    mask = valid_mask(sizes, side)
    white = canvas.astype(jnp.float32) * mask + 255.0 * (1.0 - mask)

    # Center the valid region: the canvas is corner-anchored; a centered
    # white square needs a roll by ((side-h)//2, (side-w)//2). Wrap-around
    # carries white pixels, so the roll is exact.
    def center_one(img, hw):
        dy = (side - hw[0]) // 2
        dx = (side - hw[1]) // 2
        return jnp.roll(img, (dy, dx), axis=(0, 1))

    centered = jax.vmap(center_one)(white, sizes)
    resized = jax.image.resize(
        centered,
        (canvas.shape[0], image_size, image_size, 3),
        method="cubic",
        antialias=True,
    )
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (resized / 255.0 - mean) / std


def preprocess_canvas(
    canvas: jax.Array,
    sizes: jax.Array,
    clip_size: int = DEFAULT_IMAGE_SIZE,
) -> Tuple[jax.Array, jax.Array]:
    """One canvas -> (CLIP input [B,224,224,3], SAM input [B,1024,1024,3])."""
    return clip_preprocess(canvas, sizes, clip_size), sam_preprocess(canvas, sizes)


def make_canvas(image: "object", sam_size: int = SAM_IMAGE_SIZE, out=None):
    """Host-side helper: uint8 HWC RGB image (any size) -> (canvas, (h, w)).

    Resizes the longest side to `sam_size` and corner-pastes into a fixed
    canvas. This is the ONLY host-side transform in the e2e serving path,
    so it uses cv2 (SIMD, GIL-releasing) when available. vs the PIL
    bilinear the dataset path (`SegToolBox.apply_image`) keeps for
    reference parity: the INTER_LINEAR upscale branch matches to +/-1 LSB;
    the INTER_AREA downscale branch (>1024px inputs, the common serving
    case) is a box filter — an intentional train/serve skew, measured at
    max ~16 / mean ~2 LSB on photographic-like content and up to ~82 LSB
    on iid noise (`tests/test_image_ops.py:
    test_make_canvas_downscale_divergence_bounds`).
    `out`: optional preallocated [sam_size, sam_size, 3] uint8 slot to
    write into (zero-copy batch assembly from loader threads)."""
    import numpy as np

    from ullava_tpu.data.tools.mask_toolbox import get_preprocess_shape

    image = np.asarray(image)
    h, w = image.shape[:2]
    nh, nw = get_preprocess_shape(h, w, sam_size)
    try:
        import cv2

        interp = cv2.INTER_LINEAR if nh >= h else cv2.INTER_AREA
        resized = cv2.resize(image, (nw, nh), interpolation=interp)
    except ImportError:
        from ullava_tpu.data.tools.mask_toolbox import SegToolBox

        resized = SegToolBox(sam_size).apply_image(image)
    canvas = np.zeros((sam_size, sam_size, 3), np.uint8) if out is None else out
    if out is not None:
        canvas[nh:] = 0
        canvas[:nh, nw:] = 0
    canvas[:nh, :nw] = resized
    return canvas, (nh, nw)
