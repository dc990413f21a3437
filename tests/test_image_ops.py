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
    (make_canvas) while the dataset path keeps PIL; on the UPSCALE branch
    (cv2 INTER_LINEAR vs PIL bilinear — both inputs here are <1024px) the
    two agree to +/-1 LSB, pinned by the second assertion. The downscale
    (INTER_AREA) branch diverges more; see
    `test_make_canvas_downscale_divergence_bounds`."""
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


def test_make_canvas_downscale_divergence_bounds():
    """The >1024px serving case takes make_canvas's cv2 INTER_AREA branch,
    a box filter that is intentionally NOT the PIL bilinear the dataset
    path uses. Pin honest, measured bounds for it: on photographic-ish
    content (gradients + gaussian texture) max |delta| stays within a few
    dozen LSB and the mean within a few LSB; on pure per-pixel noise the
    max reaches ~82 LSB (mean ~15) — that worst case is documented here,
    not asserted tightly, because no real photograph is iid noise."""
    import cv2

    from ullava_tpu.data.tools.mask_toolbox import get_preprocess_shape

    rng = np.random.default_rng(4)
    tb = SegToolBox()
    h, w = 1200, 1600
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 100 * np.sin(xx / 40) * np.cos(yy / 60)).astype(np.float32)
    tex = rng.normal(0, 20, (h, w)).astype(np.float32)
    im = np.clip(base + tex, 0, 255).astype(np.uint8)[..., None].repeat(3, axis=2)

    canvas, (nh, nw) = image_ops.make_canvas(im)
    assert (nh, nw) == get_preprocess_shape(h, w, 1024)
    assert nh < h  # really the downscale (INTER_AREA) branch
    pil_resized = tb.apply_image(im)
    d = np.abs(canvas[:nh, :nw].astype(np.int16) - pil_resized.astype(np.int16))
    # measured on this fixture: max 16, mean 1.89 — assert with headroom
    assert d.max() <= 32, d.max()
    assert d.mean() <= 4.0, d.mean()

    # iid-noise worst case (not representative of photos): measured
    # max ~82 / mean ~15; keep a loose ceiling so regressions that change
    # the resampler outright (e.g. nearest) still fail.
    noise = rng.integers(0, 256, (1536, 2048, 3), np.uint8)
    canvas_n, (nh2, nw2) = image_ops.make_canvas(noise)
    pil_n = tb.apply_image(noise)
    dn = np.abs(canvas_n[:nh2, :nw2].astype(np.int16) - pil_n.astype(np.int16))
    assert dn.max() <= 100, dn.max()
    assert dn.mean() <= 20.0, dn.mean()


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


# Measured twice-resize divergence bound (canvas path vs the reference's
# original-resolution CLIP pipeline), normalized units, over the size
# sweep in test_clip_twice_resize_divergence_bounded. CLIP std ~0.27, so
# MEAN 0.01 ~= 0.07/255 raw and MAX 0.5 ~= 13/255 raw at the worst pixel.
# Worst cases are small (<300px) images: they upscale to the 1024 canvas
# before the 224 downsample, compounding interpolation error. When
# real-checkpoint eval runs, any metric delta attributable to serving
# preprocess is bounded by these numbers (the eval harness itself uses
# the exact host path, so eval metrics are unaffected).
CLIP_TWICE_RESIZE_MAX = 0.5
CLIP_TWICE_RESIZE_MEAN = 0.01


def test_clip_twice_resize_divergence_bounded():
    """Quantify the documented canvas-path divergence
    (`ops/image_ops.py` module docstring): device `clip_preprocess` from
    the 1024 canvas vs the reference-exact original-resolution host
    pipeline, across aspect ratios, upscale/downscale regimes, and a
    square no-pad case. Measured values (smoothed noise): mean <= 0.0064,
    max <= 0.30 — asserted with headroom via the module constants."""
    import cv2

    rng = np.random.default_rng(5)
    proc = CLIPProcessor(aspect_ratio="pad")
    sweep = [(480, 640), (333, 217), (768, 1024), (1200, 1600),
             (2000, 1500), (512, 512), (90, 160)]
    for h, w in sweep:
        im = cv2.GaussianBlur(_rand_image(rng, h, w), (11, 11), 3)
        canvas, hw = image_ops.make_canvas(im)
        got = np.asarray(
            image_ops.clip_preprocess(
                jnp.asarray(canvas[None]), jnp.asarray([hw], jnp.int32)
            )
        )[0]
        ref = proc(im)
        d = np.abs(got - ref)
        assert d.max() <= CLIP_TWICE_RESIZE_MAX, (h, w, d.max())
        assert d.mean() <= CLIP_TWICE_RESIZE_MEAN, (h, w, d.mean())


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
