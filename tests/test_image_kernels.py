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


def test_resize_nearest_exact(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm
    import numpy as np

    imgs = mm.synth_images(spark, n=3, height=16, width=16)
    small = mm.resize(imgs, 8, 8).collect()
    assert all(r.height == 8 and r.width == 8 for r in small)
    r0 = next(r for r in small if r.img_id == 0)
    arr = np.frombuffer(r0.pixels, dtype=np.uint8).reshape(8, 8)
    # nearest-neighbor with 2x downscale picks every other row/col
    full = (0 * 31 + np.arange(256, dtype=np.int64) * 7) % 256
    full = full.reshape(16, 16).astype(np.uint8)
    assert (arr == full[::2, ::2]).all()


def test_frame_sampling_offsets(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm
    import numpy as np

    vids = mm.synth_videos(spark, n=2, n_frames=6, height=4, width=4)
    frames = mm.sample_frames(vids, stride=2).collect()
    assert sorted({r.frame_idx for r in frames}) == [0, 2, 4]
    r = next(x for x in frames if x.vid_id == 1 and x.frame_idx == 2)
    j = np.arange(16, dtype=np.int64)
    want = ((1 * 131 + 2 * 17 + j * 7) % 256).astype(np.uint8)
    assert (np.frombuffer(r.pixels, dtype=np.uint8) == want).all()


def test_audio_features_known_values(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm
    import numpy as np

    feats = {r.clip_id: r for r in
             mm.audio_features(mm.synth_audio(spark, n=2, n_samples=100)).collect()}
    for cid in (0, 1):
        i = np.arange(100, dtype=np.int64)
        s = ((cid * 17 + i * 13) % 2048) - 1024
        nonneg = s >= 0
        assert feats[cid].energy == int((s * s).sum())
        assert feats[cid].zero_crossings == int((nonneg[1:] != nonneg[:-1]).sum())


def test_stage_chain_composes_kernels(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm
    import numpy as np

    imgs = mm.synth_images(spark, n=4, height=12, width=12)
    for stage_op in mm.STAGE_KERNEL_CHAINS:
        out = mm.apply_stage_chain(imgs, stage_op, variant=1).collect()
        assert len(out) == 4
        for r in out:
            arr = np.frombuffer(r.pixels, dtype=np.uint8)
            assert arr.size == 12 * 12  # shape preserved through the chain


def test_stage_chain_deterministic(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm

    imgs = mm.synth_images(spark, n=3, height=8, width=8)
    a = {r.img_id: r.pixels for r in
         mm.apply_stage_chain(imgs, "scale_shift_bbox", 2).collect()}
    b = {r.img_id: r.pixels for r in
         mm.apply_stage_chain(imgs, "scale_shift_bbox", 2).collect()}
    c = {r.img_id: r.pixels for r in
         mm.apply_stage_chain(imgs, "scale_shift_bbox", 3).collect()}
    assert a == b          # same (id, variant) => identical pixels
    assert a != c          # different variant => different augmentation


def test_tile_patches_reassemble(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm
    import numpy as np

    imgs = mm.synth_images(spark, n=2, height=16, width=16)
    orig = {r.img_id: np.frombuffer(r.pixels, dtype=np.uint8).reshape(16, 16)
            for r in imgs.collect()}
    tiles = mm.tile_patches(imgs, patch=8).collect()
    assert len(tiles) == 2 * 4
    rebuilt = {i: np.zeros((16, 16), dtype=np.uint8) for i in orig}
    for t in tiles:
        arr = np.frombuffer(t.pixels, dtype=np.uint8).reshape(8, 8)
        rebuilt[t.img_id][
            t.patch_row * 8:(t.patch_row + 1) * 8,
            t.patch_col * 8:(t.patch_col + 1) * 8,
        ] = arr
    for i in orig:
        assert (rebuilt[i] == orig[i]).all()  # lossless tiling


# ---------------------------------------------------------------------------
# bilinear (ndimage order-1 spline) parity kernels
# ---------------------------------------------------------------------------


def test_zoom_bilinear_hand_golden_2x2_to_3x3():
    """Endpoint-aligned bilinear: sample i reads input i*(in-1)/(out-1),
    so the 3x3 grid over a 2x2 ramp is the exact midpoint lattice."""
    a = np.array([[0, 10], [20, 30]], dtype=np.uint8)
    got = ik.zoom_bilinear(a, 1.5)
    want = np.array([[0, 5, 10], [10, 15, 20], [20, 25, 30]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_zoom_bilinear_identity_and_shape():
    a = (np.arange(30, dtype=np.uint8)).reshape(5, 6)
    assert np.array_equal(ik.zoom_bilinear(a, 1.0), a)
    assert ik.zoom_bilinear(a, 0.5).shape == (2, 3)
    assert ik.zoom_bilinear(a, 2.0).shape == (10, 12)


def test_shift_bilinear_half_pixel_hand_golden():
    """Shift right by 0.5: out(x) = (in(x-1) + in(x)) / 2, zero-filled
    at the left edge (rounded half-even back to uint8)."""
    a = np.array([[10, 20, 40]], dtype=np.uint8)
    got = ik.shift_bilinear(a, 0.5, 0.0)
    want = np.array([[5, 15, 30]], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_shift_bilinear_integer_matches_exact_shift():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(9, 11), dtype=np.int64).astype(np.uint8)
    for rx, ry in [(2, -3), (-4, 1), (0, 0), (11, 9)]:
        assert np.array_equal(
            ik.shift_bilinear(a, float(rx), float(ry)),
            ik.shift_image(a, rx, ry),
        )


def test_bilinear_matches_scipy_when_available():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(16, 16), dtype=np.int64).astype(np.uint8)
    ours = ik.zoom_bilinear(a, 1.37).astype(np.int64)
    ref = scipy_ndimage.zoom(a, 1.37, order=1).astype(np.int64)
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).max() <= 1  # integer rounding tolerance
    ours_s = ik.shift_bilinear(a, 0.25, -1.75).astype(np.int64)
    ref_s = scipy_ndimage.shift(a, (-1.75, 0.25), order=1, cval=0).astype(
        np.int64
    )
    assert np.abs(ours_s - ref_s).max() <= 1


def test_scale_image_bilinear_interp_routes():
    a = np.array([[0, 10], [20, 30]], dtype=np.uint8)
    out = ik.scale_image(a, 1.5, interp="bilinear")
    # zoomed 3x3 midpoint lattice, center-cropped back to 2x2 at (0,0)
    assert np.array_equal(out, np.array([[0, 5], [10, 15]], dtype=np.uint8))


def test_image_entropy_flat_vs_varied(spark):
    import math

    from data_pipeline_rsna_spark.operators import multimodal as mm

    import numpy as np
    import pandas as pd

    def mk(img_id, arr):
        return (img_id, np.asarray(arr, np.uint8).tobytes(), "uint8", 1,
                len(arr))

    rows = [
        mk(0, [7] * 16),                 # constant: entropy 0, 1 level
        mk(1, list(range(16))),          # uniform over 16: ln(16)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["img_id", "pixels", "dtype", "height",
                                    "width"])
    )
    got = {r.img_id: r for r in mm.image_entropy(df).collect()}
    assert got[0].n_levels == 1 and got[0].entropy_nats == 0.0
    assert got[1].n_levels == 16
    assert abs(got[1].entropy_nats - math.log(16)) < 1e-6
