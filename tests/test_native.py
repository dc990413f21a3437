"""Native C++ host-ops: build, parity vs numpy paths, wiring."""

import numpy as np
import pytest

from ullava_tpu.data.tools import native, rle
from ullava_tpu.data.tools.mask_toolbox import SegToolBox


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_rle_roundtrip_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    for shape in [(23, 17), (64, 64), (5, 200)]:
        m = (rng.random(shape) > 0.6).astype(np.uint8)
        enc_py = rle._counts_to_leb(  # numpy encoder reference
            rle._norm_counts(rle.encode(m))
        )
        enc_c = native.rle_encode(m)
        assert enc_c == enc_py
        dec_c = native.rle_decode(enc_c, *shape)
        np.testing.assert_array_equal(dec_c, m)


def test_decode_dispatches_to_native(lib_ok):
    rng = np.random.default_rng(1)
    m = (rng.random((33, 44)) > 0.5).astype(np.uint8)
    enc = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(enc), m)


def test_native_resize_nearest_matches_pil(lib_ok):
    from PIL import Image

    rng = np.random.default_rng(2)
    m = (rng.random((37, 53)) > 0.5).astype(np.uint8)
    ref = np.asarray(Image.fromarray(m).resize((24, 16), Image.NEAREST))
    got = native.resize_nearest(m, 16, 24)
    # PIL nearest uses the same center-sampling rule
    assert (got == ref).mean() > 0.99


def test_native_sam_normalize_pad_matches_numpy(lib_ok):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (30, 40, 3), np.uint8)
    tool = SegToolBox(sam_size=64)
    got = tool.preprocess(img)  # native path (uint8)
    x = (img.astype(np.float32) - tool.mean) / tool.std
    expected = np.zeros((64, 64, 3), np.float32)
    expected[:30, :40] = x
    np.testing.assert_allclose(got, expected, atol=1e-5)
