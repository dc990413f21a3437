"""On-device preprocessing parity vs the host processors."""

import numpy as np
import jax.numpy as jnp

from ullava_tpu.data.processors.clip_processor import CLIPProcessor
from ullava_tpu.data.tools.mask_toolbox import SegToolBox
from ullava_tpu.ops import image_ops


def _rand_image(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_sam_preprocess_bit_parity_with_host():
    """Device normalize/pad must be bit-exact vs `SegToolBox.preprocess`
    on the SAME resized pixels. The serving canvas resizer is cv2
    (make_canvas) while the dataset path keeps PIL — those two resamplers
    agree only to +/-1 LSB, pinned by the second assertion."""
    rng = np.random.default_rng(0)
    tb = SegToolBox()
    imgs = [_rand_image(rng, 480, 640), _rand_image(rng, 333, 217)]
    canvases, sizes, refs = [], [], []
    for im in imgs:
        canvas, (h, w) = image_ops.make_canvas(im)
        canvases.append(canvas)
        sizes.append((h, w))
        # Reference: host normalize+pad applied to the canvas's own pixels.
        refs.append(tb.preprocess(canvas[:h, :w]))
        # The cv2 serving resize stays within 1 LSB of the PIL dataset path.
        pil_resized = tb.apply_image(im)
        assert pil_resized.shape == (h, w, 3)
        assert (
            np.abs(canvas[:h, :w].astype(np.int16) - pil_resized.astype(np.int16)).max()
            <= 1
        )
    got = image_ops.sam_preprocess(
        jnp.asarray(np.stack(canvases)), jnp.asarray(sizes, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.stack(refs), rtol=0, atol=1e-5
    )


def test_clip_preprocess_close_to_host_pipeline():
    """The device CLIP path reuses the 1024 canvas (one extra bilinear
    hop vs the reference's original-resolution pad) and jax's cubic
    resize vs PIL's; outputs must stay close in normalized space."""
    rng = np.random.default_rng(1)
    proc = CLIPProcessor(aspect_ratio="pad")
    imgs = [_rand_image(rng, 480, 640), _rand_image(rng, 512, 512)]
    # Smooth the random noise so interpolation differences are meaningful
    # rather than dominated by per-pixel noise aliasing.
    import cv2

    imgs = [cv2.GaussianBlur(im, (11, 11), 3) for im in imgs]
    canvases, sizes, refs = [], [], []
    for im in imgs:
        canvas, hw = image_ops.make_canvas(im)
        canvases.append(canvas)
        sizes.append(hw)
        refs.append(proc(im))
    got = np.asarray(
        image_ops.clip_preprocess(
            jnp.asarray(np.stack(canvases)), jnp.asarray(sizes, jnp.int32)
        )
    )
    ref = np.stack(refs)
    # normalized units: CLIP std ~0.27, so 0.1 ~= 2.7/255 raw pixel error
    err = np.abs(got - ref).mean()
    assert err < 0.08, err
    assert np.abs(got - ref).max() < 1.0


def test_clip_preprocess_square_image_matches_host_resize():
    """For an already-square image the pad/center steps are no-ops and
    the only difference is the resampler chain."""
    rng = np.random.default_rng(2)
    import cv2

    im = cv2.GaussianBlur(_rand_image(rng, 800, 800), (11, 11), 3)
    proc = CLIPProcessor(aspect_ratio="pad")
    canvas, hw = image_ops.make_canvas(im)
    got = np.asarray(
        image_ops.clip_preprocess(
            jnp.asarray(canvas[None]), jnp.asarray([hw], jnp.int32)
        )
    )[0]
    ref = proc(im)
    assert np.abs(got - ref).mean() < 0.08


def test_preprocess_canvas_shapes_and_dtype():
    rng = np.random.default_rng(3)
    canvas, hw = image_ops.make_canvas(_rand_image(rng, 300, 400))
    clip_px, sam_px = image_ops.preprocess_canvas(
        jnp.asarray(canvas[None]), jnp.asarray([hw], jnp.int32)
    )
    assert clip_px.shape == (1, 224, 224, 3)
    assert sam_px.shape == (1, 1024, 1024, 3)
    assert clip_px.dtype == jnp.float32
    # padding region of the SAM input must be exactly zero
    assert float(jnp.abs(sam_px[0, hw[0] :, :, :]).max()) == 0.0
