"""Property tests for the numpy pixel kernels (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_rsna_spark.operators import image_kernels as ik


@pytest.fixture
def img():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(16, 16), dtype=np.uint16)


def test_flip_involution(img):
    assert np.array_equal(ik.flip_image(ik.flip_image(img)), img)


def test_shift_exact_and_zero_fill(img):
    out = ik.shift_image(img, 3, -2)
    # content translated: out[y, x] == img[y+2, x-3] in the overlap
    assert np.array_equal(out[0:14, 3:16], img[2:16, 0:13])
    assert (out[:, :3] == 0).all() and (out[14:, :] == 0).all()
    # shifting by 0 is identity
    assert np.array_equal(ik.shift_image(img, 0, 0), img)


def test_shift_composes_additively(img):
    a = ik.shift_image(ik.shift_image(img, 2, 1), 3, 2)
    b = ik.shift_image(img, 5, 3)
    assert np.array_equal(a, b)


def test_zoom_shapes_and_identity(img):
    assert ik.zoom_nearest(img, 1.0).shape == img.shape
    assert np.array_equal(ik.zoom_nearest(img, 1.0), img)
    assert ik.zoom_nearest(img, 0.5).shape == (8, 8)
    assert ik.zoom_nearest(img, 2.0).shape == (32, 32)


def test_scale_image_preserves_dims(img):
    for rf in (0.5, 0.9, 1.0, 1.3, 2.0):
        out = ik.scale_image(img, rf)
        assert out.shape == img.shape
        assert out.dtype == img.dtype
    # shrink pads with zeros at the border
    small = ik.scale_image(img, 0.5)
    assert (small[:4, :] == 0).all() and (small[:, :4] == 0).all()


def test_cut_paste_moves_region():
    arr = np.zeros((10, 10), dtype=np.uint8)
    arr[2:4, 2:4] = 9
    out = ik.cut_paste_box(arr, (2, 2, 2, 2), 3, 4)
    assert (out[2:4, 2:4] == 0).all()  # source zeroed
    assert (out[6:8, 5:7] == 9).all()  # pasted at (x+3, y+4)


def test_cut_paste_clips_at_border():
    arr = np.full((8, 8), 5, dtype=np.uint8)
    out = ik.cut_paste_box(arr, (5, 5, 3, 3), 2, 2)
    assert out.shape == arr.shape  # no exception, clipped paste
    assert (out[7:, 7:] == 5).all()


def test_seeded_rng_deterministic():
    a = ik.seeded_rng("p1", 3, "shift").integers(0, 1 << 30, size=5)
    b = ik.seeded_rng("p1", 3, "shift").integers(0, 1 << 30, size=5)
    c = ik.seeded_rng("p1", 4, "shift").integers(0, 1 << 30, size=5)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
