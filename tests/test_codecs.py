"""Stdlib PNG/DICOM codecs: roundtrips, filter coverage, the Spark
codec-roundtrip chain, and the PNG directory sink (O7/O10)."""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from data_pipeline_rsna_spark.functions import codecs as C
from data_pipeline_rsna_spark.functions import jpeg2000 as JK


@pytest.fixture(scope="module")
def arr():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (37, 53), dtype=np.uint8)


def test_png_roundtrip_and_signature(arr):
    png = C.encode_png_gray(arr)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(C.decode_png_gray(png), arr)


def test_png_decoder_handles_all_filter_types(arr):
    """Other encoders choose filters adaptively — the decoder must undo
    Sub/Up/Average/Paeth, not just the filter-0 rows our encoder emits.
    Build streams filtered entirely with each type and decode them."""
    h, w = arr.shape

    def enc(ftype):
        lines, prev = [], np.zeros(w, np.int64)
        for y in range(h):
            cur = arr[y].astype(np.int64)
            f = cur.copy()
            if ftype == 1:
                f[1:] = (cur[1:] - cur[:-1]) % 256
            elif ftype == 2:
                f = (cur - prev) % 256
            elif ftype == 3:
                f[0] = (cur[0] - prev[0] // 2) % 256
                for x in range(1, w):
                    f[x] = (cur[x] - (cur[x - 1] + prev[x]) // 2) % 256
            elif ftype == 4:
                f[0] = (cur[0] - C._paeth(0, int(prev[0]), 0)) % 256
                for x in range(1, w):
                    f[x] = (
                        cur[x]
                        - C._paeth(int(cur[x - 1]), int(prev[x]),
                                   int(prev[x - 1]))
                    ) % 256
            lines.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            C._PNG_SIG
            + C._chunk(b"IHDR", ihdr)
            + C._chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + C._chunk(b"IEND", b"")
        )

    for ft in (1, 2, 3, 4):
        assert np.array_equal(C.decode_png_gray(enc(ft)), arr), f"filter {ft}"


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16])
def test_dicom_roundtrip_dtypes(arr, dt):
    a = arr.astype(dt) if dt == np.uint8 else (arr.astype(dt) * 3 - 100)
    a = a.astype(dt)
    data = C.encode_dicom_gray(a)
    assert data[128:132] == b"DICM"
    back = C.decode_dicom_gray(data)
    assert back.dtype == a.dtype and np.array_equal(back, a)


def test_dicom_rejects_garbage():
    with pytest.raises(ValueError):
        C.decode_dicom_gray(b"\x00" * 200)
    with pytest.raises(ValueError):
        C.decode_png_gray(b"JFIF not a png")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        arr=arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 40), st.integers(1, 40)
            ),
            elements=st.integers(0, 255),
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_property(arr):
        assert np.array_equal(C.decode_png_gray(C.encode_png_gray(arr)), arr)

    @given(
        arr=arrays(
            np.int16,
            st.tuples(st.integers(1, 24), st.integers(1, 24)),
            elements=st.integers(-(2 ** 15), 2 ** 15 - 1),
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_dicom_roundtrip_property(arr):
        back = C.decode_dicom_gray(C.encode_dicom_gray(arr))
        assert back.dtype == np.int16 and np.array_equal(back, arr)

except ImportError:  # pragma: no cover - hypothesis always present here
    pass


@pytest.mark.slow
def test_spark_codec_roundtrip_preserves_pixels(spark):
    from data_pipeline_rsna_spark.operators import multimodal as mm

    imgs = mm.synth_images(spark, n=8, height=16, width=16)
    before = {r.img_id: r.pixels for r in imgs.collect()}
    after = {r.img_id: r.pixels for r in mm.codec_roundtrip(imgs).collect()}
    assert before == after


def test_png_dir_sink_writes_decodable_files(spark, tmp_path):
    from data_pipeline_rsna_spark.operators import multimodal as mm
    from data_pipeline_rsna_spark.sinks.images import write_png_dir

    imgs = mm.synth_images(spark, n=6, height=16, width=16)
    manifest = write_png_dir(imgs, str(tmp_path / "png_out")).collect()
    assert len(manifest) == 6
    files = sorted(glob.glob(str(tmp_path / "png_out" / "*.png")))
    assert len(files) == 6
    # every written file decodes back to the closed-form pixels
    for r in manifest:
        got = C.decode_png_gray(open(r.file, "rb").read())
        want = (
            (r.img_id * 31 + np.arange(256, dtype=np.int64) * 7) % 256
        ).astype(np.uint8).reshape(16, 16)
        assert np.array_equal(got, want)


def test_encode_png_bytescales_uint16_like_imsave():
    """Non-uint8 input must min-max rescale to uint8 (scipy.misc.imsave's
    implicit bytescale, the reference's PNG write semantics) — not wrap
    mod 256."""
    from data_pipeline_rsna_spark.operators.multimodal import bytescale, encode_png

    ramp = (np.arange(256, dtype=np.uint16) * 257).reshape(16, 16)  # 0..65535
    got = C.decode_png_gray(encode_png(ramp))
    want = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(got, want)
    # uint8 passes through untouched
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert bytescale(u8) is u8
    # constant non-uint8 images map to zeros (no divide-by-zero)
    const = np.full((4, 4), 1234, dtype=np.int32)
    assert np.array_equal(bytescale(const), np.zeros((4, 4), np.uint8))
    # int16 with negatives rescales, never wraps
    signed = np.array([[-100, 0], [100, 300]], dtype=np.int16)
    out = bytescale(signed)
    assert out.dtype == np.uint8
    assert out[0, 0] == 0 and out[1, 1] == 255


def test_label_map_binary_truncated_varint_raises_valueerror():
    """A truncated varint must raise a clean ValueError (parse error),
    not IndexError — so read_label_map's try-text-then-binary order
    degrades cleanly on corrupt files."""
    from data_pipeline_rsna_spark.sources.readers import parse_label_map_binary

    with pytest.raises(ValueError):
        parse_label_map_binary(b"\x0a\xff")  # length varint cut off


def test_decode_dicom_rejects_compressed_transfer_syntax():
    """An HTJ2K (1.2.840.10008.1.2.4.201) file must fail with a clear
    transfer-syntax error — not a misparse of encapsulated PixelData.
    (.4.50 baseline, .4.57/.4.70 lossless, .4.80/.4.81 JPEG-LS and
    .4.90/.4.91 JPEG 2000 now decode stdlib-side; the pydicom path
    (operators.multimodal.decode_dicom) owns the rest when the library
    is present.)"""
    meta = C._elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.201")
    data = b"\x00" * 128 + b"DICM" + meta
    with pytest.raises(ValueError, match="transfer syntax 1.2.840.10008.1.2.4.201"):
        C.decode_dicom_gray(data)
    # the reader's own explicit-LE output still decodes (no false trip)
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(C.decode_dicom_gray(C.encode_dicom_gray(arr)), arr)


# ---------------------------------------------------------------------------
# RLE Lossless (1.2.840.10008.1.2.5) — PS3.5 Annex G PackBits
# ---------------------------------------------------------------------------


def test_packbits_golden_decode():
    # spec-golden: literal code 2 -> 3 literals; replicate 254 -> 3 copies;
    # 128 is a no-op
    stream = bytes([2, 10, 20, 30, 254, 7, 128, 0, 99])
    got = C._packbits_decode(stream, 7)
    assert list(got) == [10, 20, 30, 7, 7, 7, 99]
    with pytest.raises(ValueError, match="truncated"):
        C._packbits_decode(stream, 20)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16])
def test_dicom_rle_roundtrip_dtypes(arr, dt):
    a = arr.astype(dt)
    blob = C.encode_dicom_rle(a)
    out = C.decode_dicom_gray(blob)
    assert out.dtype == a.dtype
    assert np.array_equal(out, a)


def test_dicom_rle_compresses_flat_images():
    flat = np.full((64, 64), 1000, dtype=np.uint16)
    rle = C.encode_dicom_rle(flat)
    raw = C.encode_dicom_gray(flat)
    assert len(rle) < len(raw) / 4  # runs collapse
    assert np.array_equal(C.decode_dicom_gray(rle), flat)


def test_dicom_rle_rejects_bad_segment_count():
    a = np.zeros((4, 4), dtype=np.uint16)
    blob = bytearray(C.encode_dicom_rle(a))
    # find the frame header (after the empty BOT item) and corrupt nseg
    marker = struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    bot = blob.find(marker)
    frag_head = bot + len(marker)
    payload = frag_head + 8
    blob[payload:payload + 4] = struct.pack("<I", 3)
    with pytest.raises(ValueError, match="3 segments"):
        C.decode_dicom_gray(bytes(blob))


def test_unsupported_jpeg_syntaxes_still_rejected():
    """Baseline (.4.50), Lossless (.4.57/.4.70), JPEG-LS (.4.80/.4.81)
    and JPEG 2000 (.4.90/.4.91) decode stdlib-side (round 8); only
    HTJ2K (.4.201-203) still raises a named error — the contract
    narrowed to exactly what is not implemented."""
    for uid in (b"1.2.840.10008.1.2.4.201", b"1.2.840.10008.1.2.4.202",
                b"1.2.840.10008.1.2.4.203"):
        meta = C._elem(0x0002, 0x0010, b"UI", uid)
        data = b"\x00" * 128 + b"DICM" + meta
        with pytest.raises(ValueError, match=uid.decode()):
            C.decode_dicom_gray(data)


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py)
# ---------------------------------------------------------------------------

from data_pipeline_rsna_spark.functions import jpeg as J  # noqa: E402


def _smooth(h=64, w=96):
    x = np.arange(h)[:, None] + np.arange(w)[None, :]
    return ((np.sin(x / 9.0) * 100) + 120).astype(np.uint8)


def test_jpeg_roundtrip_quality_tolerance():
    img = _smooth()
    for q, tol in ((95, 4), (90, 6), (75, 14)):
        dec = J.decode_jpeg_baseline(J.encode_jpeg_baseline_gray(img, q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol, q


def test_jpeg_roundtrip_odd_dimensions():
    img = np.linspace(0, 255, 61 * 45).reshape(61, 45).astype(np.uint8)
    dec = J.decode_jpeg_baseline(J.encode_jpeg_baseline_gray(img, 92))
    assert dec.shape == (61, 45)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_jpeg_restart_intervals_roundtrip():
    """DRI + RSTn resync path: every interval must decode to the same
    image the unsegmented stream does."""
    img = _smooth(40, 56)
    base = J.decode_jpeg_baseline(J.encode_jpeg_baseline_gray(img, 90))
    for ri in (1, 3, 5):
        enc = J.encode_jpeg_baseline_gray(img, 90, restart_interval=ri)
        assert np.array_equal(J.decode_jpeg_baseline(enc), base), ri


def test_jpeg_block_constant_images_roundtrip_exactly():
    """A constant 8x8 block has only a DC coefficient; the Annex-K DC
    quantizer reconstructs it to < 0.5 gray levels — bit-exact after
    rounding. This is the property the multimodal_jpeg_roundtrip
    oracle stands on."""
    yy, xx = np.mgrid[0:16, 0:16]
    blk = (yy // 8) * 2 + (xx // 8)
    for img_id in (0, 7, 131):
        img = ((img_id * 37 + blk * 11) % 256).astype(np.uint8)
        dec = J.decode_jpeg_baseline(J.encode_jpeg_baseline_gray(img, 92))
        assert np.array_equal(dec, img), img_id


def test_jpeg_rejects_progressive_and_truncated():
    img = _smooth(16, 16)
    enc = bytearray(J.encode_jpeg_baseline_gray(img, 90))
    sof = bytes(enc).find(b"\xFF\xC0")
    enc[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg_baseline(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg_baseline(b"\x00\x01\x02")


def test_dicom_jpeg_wrapper_roundtrip():
    """Part-10 JPEG-Baseline encapsulation: encode_dicom_jpeg →
    decode_dicom_gray, dims/dtype preserved, tolerance bounded."""
    img = _smooth(32, 48)
    out = C.decode_dicom_gray(C.encode_dicom_jpeg(img, quality=95))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker. Inject fill bytes before SOF/DHT/SOS and between the entropy
    segment's RST markers; decode must be unchanged (ADVICE r7)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    enc = J.encode_jpeg_baseline_gray(img, 90, restart_interval=2)
    base = J.decode_jpeg_baseline(enc)
    padded = bytearray()
    i = 0
    n = len(enc)
    in_entropy = False
    while i < n:
        if not in_entropy and enc[i] == 0xFF and i + 1 < n and enc[i + 1] != 0x00:
            padded += b"\xFF\xFF"  # two fill bytes before every marker
            if enc[i + 1] == 0xDA:
                in_entropy = True
        elif in_entropy and enc[i] == 0xFF and i + 1 < n and 0xD0 <= enc[i + 1] <= 0xD7:
            padded += b"\xFF"  # fill before a restart marker
        padded.append(enc[i])
        i += 1
    # the leading SOI check reads data[:2] — keep SOI unpadded
    assert padded[:4] == b"\xFF\xFF\xFF\xD8"
    fixed = b"\xFF\xD8" + bytes(padded[4:])
    assert np.array_equal(J.decode_jpeg_baseline(fixed), base)


def test_jpeg_truncated_streams_raise_valueerror_not_indexerror():
    """Truncation anywhere in the entropy segment must surface as
    ValueError('truncated JPEG ...'), never IndexError (ADVICE r7)."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    for ri in (0, 2):
        enc = J.encode_jpeg_baseline_gray(img, 90, restart_interval=ri)
        for cut in (len(enc) - 3, len(enc) - 8, len(enc) // 2 + 20):
            with pytest.raises(ValueError):
                J.decode_jpeg_baseline(enc[:cut])


def test_dicom_jpeg_baseline_16bit_metadata_rejected():
    """A JPEG-Baseline DICOM declaring BitsAllocated=16 is inconsistent
    (Process 1 is 8-bit only) and must be rejected, not upcast."""
    img = ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)
    blob = bytearray(C.encode_dicom_jpeg(img, quality=95))
    # flip the BitsAllocated (0028,0100) US value from 8 to 16 in place
    tag = struct.pack("<HH", 0x0028, 0x0100) + b"US"
    i = blob.find(tag)
    assert i > 0
    assert struct.unpack("<H", blob[i + 8:i + 10])[0] == 8
    blob[i + 8:i + 10] = struct.pack("<H", 16)
    with pytest.raises(ValueError, match="8-bit only"):
        C.decode_dicom_gray(bytes(blob))


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3, process 14) — round 8
# ---------------------------------------------------------------------------


def test_jpeg_lossless_roundtrip_exact_all_predictors():
    rng = np.random.default_rng(21)
    for dt, hi in ((np.uint8, 256), (np.uint16, 65536)):
        img = rng.integers(0, hi, (29, 23)).astype(dt)
        for pred in range(1, 8):
            dec = J.decode_jpeg_lossless(
                J.encode_jpeg_lossless_gray(img, predictor=pred)
            )
            assert dec.dtype == dt and np.array_equal(dec, img), (dt, pred)


def test_jpeg_lossless_edge_values_and_restarts():
    rng = np.random.default_rng(22)
    # extremes: constant 0, constant 65535, max-step gradients
    for img in (
        np.zeros((7, 7), np.uint8),
        np.full((6, 9), 65535, np.uint16),
        np.tile(np.array([0, 65535] * 8, np.uint16), (4, 1)),
    ):
        enc = J.encode_jpeg_lossless_gray(np.ascontiguousarray(img))
        assert np.array_equal(J.decode_jpeg_lossless(enc), img)
    img = rng.integers(0, 65536, (16, 16)).astype(np.uint16)
    for ri in (1, 5, 37):
        enc = J.encode_jpeg_lossless_gray(img, restart_interval=ri)
        assert np.array_equal(J.decode_jpeg_lossless(enc), img), ri


def test_jpeg_lossless_rejects_wrong_sof_and_truncation():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    base = J.encode_jpeg_baseline_gray(img, 90)
    with pytest.raises(ValueError, match="SOF0"):
        J.decode_jpeg_lossless(base)
    lossless = J.encode_jpeg_lossless_gray(img)
    with pytest.raises(ValueError, match="SOF3"):
        J.decode_jpeg_baseline(lossless)
    for cut in (len(lossless) - 4, len(lossless) // 2):
        with pytest.raises(ValueError):
            J.decode_jpeg_lossless(lossless[:cut])


def test_dicom_jpeg_lossless_roundtrip_exact_incl_signed():
    rng = np.random.default_rng(23)
    for dt, lo, hi in (
        (np.uint8, 0, 256),
        (np.uint16, 0, 65536),
        (np.int16, -32768, 32768),
    ):
        img = rng.integers(lo, hi, (19, 31)).astype(dt)
        out = C.decode_dicom_gray(C.encode_dicom_jpeg_lossless(img))
        assert out.dtype == dt and np.array_equal(out, img), dt


def test_dicom_jpeg_lossless_bits_mismatch_rejected():
    img = np.arange(100, dtype=np.uint16).reshape(10, 10)
    blob = bytearray(C.encode_dicom_jpeg_lossless(img))
    tag = struct.pack("<HH", 0x0028, 0x0100) + b"US"
    i = blob.find(tag)
    assert i > 0 and struct.unpack("<H", blob[i + 8:i + 10])[0] == 16
    blob[i + 8:i + 10] = struct.pack("<H", 8)  # claim 8-bit for a 16-bit frame
    with pytest.raises(ValueError, match="BitsAllocated"):
        C.decode_dicom_gray(bytes(blob))


# ---------------------------------------------------------------------------
# JPEG-LS (ITU-T T.87 / LOCO-I, functions/jpegls.py)
# ---------------------------------------------------------------------------

from data_pipeline_rsna_spark.functions import jpegls as LS  # noqa: E402


def test_jpegls_lossless_roundtrip_exact():
    rng = np.random.default_rng(31)
    cases = [
        rng.integers(0, 256, (23, 31)).astype(np.uint8),     # noise: regular mode
        rng.integers(0, 65536, (17, 29)).astype(np.uint16),  # 16-bit + stuffing
        np.full((16, 16), 200, np.uint8),                    # pure run mode
        np.repeat(rng.integers(0, 256, (8, 8)).astype(np.uint8),
                  4, axis=1),                                # run/regular mix
        (np.add.outer(np.arange(20) * 800, np.arange(33) * 97)
         % 65536).astype(np.uint16),                         # smooth gradients
        np.array([[5]], np.uint8),                           # 1x1
        np.arange(256, dtype=np.uint8).reshape(1, 256),      # single line
        np.arange(256, dtype=np.uint8).reshape(256, 1),      # single column
        np.zeros((7, 7), np.uint8),                          # all-zero runs
        np.full((6, 9), 65535, np.uint16),                   # max value
        np.tile(np.array([0, 65535] * 8, np.uint16), (4, 1)),  # max steps
    ]
    for img in cases:
        enc = LS.encode_jpegls_gray(np.ascontiguousarray(img))
        dec, near = LS.decode_jpegls(enc, return_near=True)
        assert near == 0
        assert dec.dtype == img.dtype and np.array_equal(dec, img), img.shape


def test_jpegls_near_lossless_error_bound():
    rng = np.random.default_rng(32)
    img8 = rng.integers(0, 256, (21, 27)).astype(np.uint8)
    img16 = rng.integers(0, 65536, (13, 19)).astype(np.uint16)
    sizes = []
    for near in (1, 3, 7):
        for img in (img8, img16):
            enc = LS.encode_jpegls_gray(img, near=near)
            dec, got = LS.decode_jpegls(enc, return_near=True)
            assert got == near
            err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
            assert err <= near, (near, img.dtype, err)
        sizes.append(len(LS.encode_jpegls_gray(img8, near=near)))
    # larger NEAR must compress harder (it's the whole point)
    assert sizes == sorted(sizes, reverse=True)


def test_jpegls_bit_stuffing_is_exercised_and_decoded():
    """T.87 stuffing: a 0xFF entropy byte is followed by a 7-bit byte
    (MSB=0) — different from T.81's FF 00. Build a corpus that provably
    produces 0xFF bytes in the stream and check the invariant."""
    rng = np.random.default_rng(33)
    stuffed = 0
    for seed in range(8):
        img = np.random.default_rng(seed).integers(
            0, 65536, (31, 37)
        ).astype(np.uint16)
        enc = LS.encode_jpegls_gray(img)
        sos = enc.find(b"\xff\xda")
        scan = enc[sos + 2 + 8:-2]  # entropy data: after SOS (Ls=8), before EOI
        for i, b in enumerate(scan[:-1]):
            if b == 0xFF:
                stuffed += 1
                assert scan[i + 1] & 0x80 == 0, "marker byte in scan"
        assert np.array_equal(LS.decode_jpegls(enc), img)
    assert stuffed > 0, "corpus never produced an 0xFF entropy byte"
    del rng


def test_jpegls_rejects_malformed_and_truncated():
    img = np.arange(144, dtype=np.uint8).reshape(12, 12)
    enc = LS.encode_jpegls_gray(img)
    with pytest.raises(ValueError, match="SOI"):
        LS.decode_jpegls(b"\x00" + enc)
    # T.81 streams are not JPEG-LS: baseline has no SOF55
    base = J.encode_jpeg_baseline_gray(img, 90)
    with pytest.raises(ValueError):
        LS.decode_jpegls(base)
    for cut in (4, len(enc) // 2, len(enc) - 3):
        with pytest.raises(ValueError):
            LS.decode_jpegls(enc[:cut])


def test_jpegls_lse_preset_parameters_parsed():
    """An LSE (ID 1) segment overrides MAXVAL/T1-3/RESET; splice one
    with the default values in — decode must accept it and still
    roundtrip (defaults spliced explicitly == defaults implied)."""
    img = np.random.default_rng(34).integers(0, 256, (9, 14)).astype(np.uint8)
    enc = LS.encode_jpegls_gray(img)
    sos = enc.find(b"\xff\xda")
    assert sos > 0
    lse = b"\xff\xf8" + struct.pack(">HBHHHHH", 13, 1, 255, 3, 7, 21, 64)
    spliced = enc[:sos] + lse + enc[sos:]
    assert np.array_equal(LS.decode_jpegls(spliced), img)
    # non-default thresholds change the stream contexts: decode of the
    # ORIGINAL scan under altered presets must not silently agree
    lse_bad = b"\xff\xf8" + struct.pack(">HBHHHHH", 13, 2, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="LSE"):
        LS.decode_jpegls(enc[:sos] + lse_bad + enc[sos:])


def test_dicom_jpegls_roundtrip_exact_incl_signed():
    rng = np.random.default_rng(35)
    for dt, lo, hi in (
        (np.uint8, 0, 256),
        (np.uint16, 0, 65536),
        (np.int16, -32768, 32768),
    ):
        img = rng.integers(lo, hi, (19, 23)).astype(dt)
        out = C.decode_dicom_gray(C.encode_dicom_jpegls(img))
        assert out.dtype == dt and np.array_equal(out, img), dt


def test_dicom_jpegls_near_syntax_and_lossless_mismatch_rejected():
    rng = np.random.default_rng(36)
    img = rng.integers(0, 256, (15, 17)).astype(np.uint8)
    blob = C.encode_dicom_jpegls(img, near=2)
    assert b"1.2.840.10008.1.2.4.81" in blob
    out = C.decode_dicom_gray(blob)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    # a NEAR>0 stream inside the lossless .4.80 syntax is inconsistent
    tampered = blob.replace(b"1.2.840.10008.1.2.4.81",
                            b"1.2.840.10008.1.2.4.80")
    with pytest.raises(ValueError, match="NEAR"):
        C.decode_dicom_gray(tampered)


def test_jpegls_mutated_streams_raise_valueerror_never_crash():
    """Seeded byte-mutation fuzz: corrupt streams must either decode
    (mutation hit a don't-care bit) or raise ValueError — never
    IndexError/struct.error (the jpeg.py r7 contract, extended to
    JPEG-LS; a truncated-segment IndexError was found exactly this
    way)."""
    img = np.random.default_rng(0).integers(0, 65536, (9, 9)).astype(np.uint16)
    enc = bytearray(LS.encode_jpegls_gray(img))
    for trial in range(300):
        blob = bytearray(enc)
        r = np.random.default_rng(trial)
        for _ in range(r.integers(1, 4)):
            blob[r.integers(0, len(blob))] = r.integers(0, 256)
        try:
            LS.decode_jpegls(bytes(blob))
        except ValueError:
            pass


def test_codec_family_matches_pydicom_when_available():
    """The single pydicom-gated conformance test: every compressed
    syntax this engine ENCODES (JPEG Lossless SV1, JPEG-LS, JPEG 2000,
    RLE) must decode to the identical array through pydicom + its
    native plugins — pinning the from-scratch codecs against the
    reference's own decode path (generate_images_from_dicom.py:44-51)
    wherever that stack is installed. Skipped in the default container
    (pydicom absent): the in-container correctness story is the seeded
    fuzz + closed-form oracle roundtrips above; this test upgrades it
    to cross-implementation conformance when the preferred deployment
    stack exists."""
    pydicom = pytest.importorskip("pydicom")
    import io

    rng = np.random.default_rng(77)
    img16 = rng.integers(0, 4096, (19, 23)).astype(np.uint16)
    img8 = rng.integers(0, 256, (19, 23)).astype(np.uint8)
    imgs16 = rng.integers(-2048, 2048, (19, 23)).astype(np.int16)
    blobs = [
        C.encode_dicom_jpeg_lossless(img16),
        C.encode_dicom_jpegls(img16),
        C.encode_dicom_j2k(img16),
        C.encode_dicom_rle(img8),
        # signed: Ssiz/PixelRepresentation agreement is exactly what
        # cross-implementation decode catches (ADVICE r8)
        C.encode_dicom_j2k(imgs16),
        C.encode_dicom_jpeg_lossless(imgs16),
        C.encode_dicom_jpegls(imgs16),
    ]
    for blob in blobs:
        ds = pydicom.dcmread(io.BytesIO(blob))
        try:
            px = ds.pixel_array
        except Exception as e:  # plugin for this syntax not installed
            pytest.skip(f"pydicom lacks a decoder here: {e}")
        ours = C.decode_dicom_gray(blob)
        assert np.array_equal(px, ours), ds.file_meta.TransferSyntaxUID
    # lossy 9/7 (.4.91): openjpeg and our float path may round the
    # inverse DWT differently at half-integer boundaries — conformance
    # is agreement within ±1, not bit equality
    lossy = C.encode_dicom_j2k_lossy(img16, delta=1 / 256)
    ds = pydicom.dcmread(io.BytesIO(lossy))
    try:
        px = ds.pixel_array
    except Exception as e:
        pytest.skip(f"pydicom lacks a J2K decoder: {e}")
    ours = C.decode_dicom_gray(lossy)
    assert np.abs(
        px.astype(np.int64) - ours.astype(np.int64)
    ).max() <= 1


# ---------------------------------------------------------------------------
# multi-frame DICOM (NumberOfFrames > 1, PS3.5 A.4)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("syntax", ["raw", "rle", "jpegls",
                                    "jpeg_lossless", "j2k"])
def test_dicom_multiframe_roundtrip_all_syntaxes(syntax):
    rng = np.random.default_rng(41)
    for dt, lo, hi in [(np.uint8, 0, 256), (np.uint16, 0, 65536),
                       (np.int16, -32768, 32768)]:
        stack = rng.integers(lo, hi, size=(4, 9, 7)).astype(dt)
        blob = C.encode_dicom_multiframe(stack, syntax)
        out = C.decode_dicom_frames(blob)
        assert out.dtype == stack.dtype
        assert np.array_equal(out, stack), (syntax, dt)


def test_dicom_multiframe_gray_reader_rejects_with_named_error():
    stack = np.zeros((3, 4, 4), dtype=np.uint8)
    blob = C.encode_dicom_multiframe(stack, "rle")
    with pytest.raises(ValueError, match="decode_dicom_frames"):
        C.decode_dicom_gray(blob)


def test_dicom_frames_on_single_frame_returns_1hw():
    a = np.arange(30, dtype=np.uint16).reshape(5, 6)
    for blob in (C.encode_dicom_gray(a), C.encode_dicom_j2k(a),
                 C.encode_dicom_rle(a)):
        out = C.decode_dicom_frames(blob)
        assert out.shape == (1, 5, 6) and np.array_equal(out[0], a)


def test_dicom_multiframe_bot_grouping_of_split_fragments():
    """A frame may span several fragments; only the Basic Offset Table
    can group them. Build a 2-frame J2K file whose first frame is split
    into two fragments and check the BOT path reassembles it."""
    rng = np.random.default_rng(43)
    stack = rng.integers(0, 65536, size=(2, 8, 8)).astype(np.uint16)
    f0 = JK.encode_j2k_gray(stack[0])
    f1 = JK.encode_j2k_gray(stack[1])
    if len(f0) % 2:
        f0 += b"\x00"
    if len(f1) % 2:
        f1 += b"\x00"
    cut = (len(f0) // 2) & ~1  # even split point
    item = lambda p: (  # noqa: E731
        struct.pack("<HHI", 0xFFFE, 0xE000, len(p)) + p
    )
    frags = [f0[:cut], f0[cut:], f1]
    offsets, off = [], 0
    for fr in frags:
        offsets.append(off)
        off += 8 + len(fr)
    bot = struct.pack("<2I", offsets[0], offsets[2])  # frame starts
    # swap the pixel element of a stock 2-frame file for the split one
    blob = bytearray(C.encode_dicom_multiframe(stack, "j2k"))
    at = blob.find(struct.pack("<HH", 0x7FE0, 0x0010))
    pixel = (
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF)
        + item(bot) + b"".join(item(fr) for fr in frags)
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    blob = bytes(blob[:at]) + pixel
    out = C.decode_dicom_frames(blob)
    assert np.array_equal(out, stack)


def test_dicom_multiframe_ambiguous_fragmentation_rejected():
    """3 fragments, 2 frames, empty BOT: a guess would silently decode
    garbage — the reader must name the problem."""
    rng = np.random.default_rng(44)
    stack = rng.integers(0, 65536, size=(2, 8, 8)).astype(np.uint16)
    blob = bytearray(C.encode_dicom_multiframe(stack, "j2k"))
    at = blob.find(struct.pack("<HH", 0x7FE0, 0x0010))
    f0 = JK.encode_j2k_gray(stack[0])
    f1 = JK.encode_j2k_gray(stack[1])
    if len(f0) % 2:
        f0 += b"\x00"
    if len(f1) % 2:
        f1 += b"\x00"
    cut = (len(f0) // 2) & ~1
    item = lambda p: (  # noqa: E731
        struct.pack("<HHI", 0xFFFE, 0xE000, len(p)) + p
    )
    pixel = (
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF)
        + item(b"")  # empty BOT
        + item(f0[:cut]) + item(f0[cut:]) + item(f1)
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    with pytest.raises(ValueError, match="fragments into 2 frames"):
        C.decode_dicom_frames(bytes(blob[:at]) + pixel)


def test_dicom_single_frame_split_fragments_empty_bot_decodes():
    """NumberOfFrames==1 with the frame split over 2 fragments and an
    empty BOT is never ambiguous — all fragments belong to the one
    frame. decode_dicom_frames must accept it exactly like
    decode_dicom_gray does (ADVICE r8: the frames reader was stricter
    than its documented single-frame contract)."""
    rng = np.random.default_rng(45)
    a = rng.integers(0, 65536, size=(8, 8)).astype(np.uint16)
    f0 = JK.encode_j2k_gray(a)
    if len(f0) % 2:
        f0 += b"\x00"
    cut = (len(f0) // 2) & ~1
    item = lambda p: (  # noqa: E731
        struct.pack("<HHI", 0xFFFE, 0xE000, len(p)) + p
    )
    blob = bytearray(C.encode_dicom_multiframe(a[None, :, :], "j2k"))
    at = blob.find(struct.pack("<HH", 0x7FE0, 0x0010))
    pixel = (
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF)
        + item(b"")  # empty BOT
        + item(f0[:cut]) + item(f0[cut:])
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    data = bytes(blob[:at]) + pixel
    out = C.decode_dicom_frames(data)
    assert out.shape == (1, 8, 8) and np.array_equal(out[0], a)
    # parity with the single-frame reader on the identical bytes:
    # multi-frame files carry NumberOfFrames so the gray reader defers,
    # but a frames/gray disagreement on 1-frame content is the bug class


def test_dicom_j2k_int16_codestream_is_signed_ssiz():
    """encode_dicom_j2k(int16) must emit a SIGNED J2K codestream (Ssiz
    sign bit set) so Ssiz agrees with PixelRepresentation=1 — a
    third-party decoder (pydicom+openjpeg) reads the codestream's own
    signedness (ADVICE r8)."""
    a = (np.arange(64, dtype=np.int16) - 32).reshape(8, 8)
    blob = C.encode_dicom_j2k(a)
    # extract the J2K frame: first non-empty encapsulated item
    soc = blob.find(b"\xff\x4f\xff\x51")
    assert soc != -1
    siz = blob.find(b"\xff\x51", soc)
    ssiz = blob[siz + 40]  # Rsiz..Csiz = 36 bytes after len; Ssiz next
    assert ssiz & 0x80, "Ssiz sign bit must be set for int16 input"
    assert (ssiz & 0x7F) + 1 == 16
    out = C.decode_dicom_gray(blob)
    assert out.dtype == np.int16 and np.array_equal(out, a)
    # multi-frame twin
    stack = np.stack([a, a.T.copy()])
    mf = C.encode_dicom_multiframe(stack, "j2k")
    socs = mf.find(b"\xff\x4f\xff\x51")
    sizs = mf.find(b"\xff\x51", socs)
    assert mf[sizs + 40] & 0x80
    outs = C.decode_dicom_frames(mf)
    assert outs.dtype == np.int16 and np.array_equal(outs, stack)


def test_dicom_j2k_lossy_roundtrip_bounded_error():
    """The .4.91 irreversible path (round 9): encode_dicom_j2k_lossy →
    decode_dicom_gray is lossy with |out − in| ≲ delta·2^prec, for all
    three dtypes; the transfer syntax UID and dtype survive."""
    rng = np.random.default_rng(46)
    for dt, lo, hi, prec in ((np.uint8, 0, 256, 8),
                             (np.uint16, 0, 4096, 16),
                             (np.int16, -2048, 2048, 16)):
        a = rng.integers(lo, hi, (31, 29)).astype(dt)
        blob = C.encode_dicom_j2k_lossy(a, delta=1 / 256)
        assert b"1.2.840.10008.1.2.4.91" in blob
        out = C.decode_dicom_gray(blob)
        assert out.dtype == a.dtype and out.shape == a.shape
        err = np.abs(out.astype(np.int64) - a.astype(np.int64)).max()
        assert err <= 1.5 * (1 / 256) * (1 << prec), (dt, err)


def test_dicom_j2k_lossy_smooth_image_compresses():
    x = np.arange(64)[:, None] + np.arange(96)[None, :]
    img = ((np.sin(x / 9.0) * 100) + 120).astype(np.uint8)
    lossy = C.encode_dicom_j2k_lossy(img, delta=1 / 32)
    lossless = C.encode_dicom_j2k(img)
    assert len(lossy) < len(lossless) * 0.6
