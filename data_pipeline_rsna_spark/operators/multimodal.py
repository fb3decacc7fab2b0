"""Multimodal columns (SURVEY.md §2.3 X7, generalizing O6/O7/O10).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata (height, width, dtype) — Spark has no tensor type,
and at 100 TB you never want one: the payload stays columnar-compressed
in parquet, metadata predicates prune without touching pixels, and only
the pandas-UDF stages that genuinely need pixels deserialize them.

The Python boundary is crossed exactly where unavoidable, via
``mapInPandas`` (Arrow batches). Batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set low in
``session.py`` because one row can be megabytes).

Codecs: ``decode_dicom``/``encode_png`` prefer pydicom/PIL when
installed, and otherwise run the stdlib-only implementations in
``functions.codecs`` (zlib+struct PNG, explicit-VR-LE uncompressed
DICOM) — so both execute for real in this container; the
``multimodal_codec_roundtrip`` query hash-checks the full
encode→decode→stats chain against a closed-form oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import image_kernels as ik

PIXELS_SCHEMA = (
    "img_id long, pixels binary, dtype string, height int, width int"
)
STATS_SCHEMA = (
    "img_id long, sum_px long, mean_px double, min_px int, max_px int"
)

# ---------------------------------------------------------------------------
# codec stubs (import-gated)
# ---------------------------------------------------------------------------


def decode_dicom(content: bytes) -> np.ndarray:
    """DICOM bytes → pixel array (O7, ref generate_images_from_dicom.py:
    48-51). pydicom when installed (full transfer-syntax coverage);
    otherwise the stdlib-only explicit-VR-LE uncompressed reader in
    ``functions.codecs`` — which covers the monochrome shape the
    reference pipeline actually consumes."""
    try:
        import io

        import pydicom  # type: ignore[import-not-found]

        return pydicom.dcmread(io.BytesIO(content)).pixel_array
    except ImportError:
        from ..functions.codecs import decode_dicom_gray

        return decode_dicom_gray(content)


def bytescale(arr: np.ndarray) -> np.ndarray:
    """``scipy.misc.imsave``'s implicit conversion (the reference writes
    every PNG through imsave, generate_images_from_dicom.py:80): non-uint8
    input is linearly min-max rescaled to the full uint8 range —
    ``(v - min) * 255 / (max - min) + 0.5`` truncated. Real DICOM pixels
    are typically MONOCHROME2 uint16, so this rescale IS the reference's
    output semantics; a mod-256 cast (the previous fallback) silently
    corrupts every pixel above 255."""
    if arr.dtype == np.uint8:
        return arr
    if arr.size == 0:
        return arr.astype(np.uint8)
    a = arr.astype(np.float64)
    lo = float(a.min())
    hi = float(a.max())
    if hi <= lo:
        return np.zeros(arr.shape, np.uint8)
    return ((a - lo) * (255.0 / (hi - lo)) + 0.5).astype(np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """ndarray → PNG bytes (O10, ref generate_images_from_dicom.py:80).
    Non-uint8 input is ``bytescale``d first — on BOTH paths, so the PIL
    and stdlib encoders emit identical 8-bit images (PIL would otherwise
    write a 16-bit PNG for uint16 input, diverging from the reference's
    imsave). PIL when installed; otherwise the stdlib zlib+struct
    grayscale encoder in ``functions.codecs``."""
    arr = bytescale(arr)
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:
        from ..functions.codecs import encode_png_gray

        return encode_png_gray(np.ascontiguousarray(arr))


# ---------------------------------------------------------------------------
# binary-file source (O6/O8)
# ---------------------------------------------------------------------------


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str = "*.dcm") -> DataFrame:
    """O6+O8: binaryFile scan with suffix filter and patient-id derivation
    (basename minus extension, generate_images_from_dicom.py:75-77)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    base = F.regexp_extract(F.col("path"), r"([^/]+)$", 1)
    return df.select(
        "path",
        F.regexp_replace(base, r"\.[^.]*$", "").alias("patient_id"),
        "content",
    )


# ---------------------------------------------------------------------------
# deterministic synthetic corpus (the testable stand-in for DICOM pixels)
# ---------------------------------------------------------------------------


def synth_images(spark: SparkSession, n: int = 200, height: int = 16,
                 width: int = 16, mod: int = 256) -> DataFrame:
    """n deterministic uint8 images: pixel[i] = (img_id*31 + i*7) % mod.
    Closed-form per pixel, so any engine can recompute the expected
    statistics exactly — this is what makes the pandas-UDF plumbing
    oracle-checkable. ``mod`` < 256 leaves headroom below the uint8
    ceiling (e.g. so a saturating brightness shift provably never
    saturates — the dHash invariance corpus uses 200)."""
    npx = height * width

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for img_id in ids:
                px = (img_id * 31 + np.arange(npx, dtype=np.int64) * 7) % mod
                rows.append(
                    (int(img_id), px.astype(np.uint8).tobytes(), "uint8",
                     height, width)
                )
            yield pd.DataFrame(
                rows, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return spark.range(n).mapInPandas(gen, PIXELS_SCHEMA)


def synth_images16(spark: SparkSession, n: int = 120, height: int = 10,
                   width: int = 10) -> DataFrame:
    """uint16 twin of ``synth_images`` for the archival-depth codec
    paths (CR/DX pixel data is 12-16 bit): pixel[i] = (img_id*523 +
    i*659) % 65536 — multipliers sized so the modulus genuinely wraps
    (high uint16 values are exercised), closed-form so the oracle
    recomputes every pixel exactly."""
    npx = height * width

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id in pdf["id"].to_numpy():
                px = (
                    img_id * 523 + np.arange(npx, dtype=np.int64) * 659
                ) % 65536
                rows.append(
                    (int(img_id), px.astype(np.uint16).tobytes(), "uint16",
                     height, width)
                )
            yield pd.DataFrame(
                rows, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return spark.range(n).mapInPandas(gen, PIXELS_SCHEMA)


def jpeg_lossless_roundtrip(images: DataFrame) -> DataFrame:
    """Pixels → JPEG-Lossless SV1 DICOM encode → decode → pixels, all
    inside the Arrow batch: the archival CR/DX transfer syntax
    (1.2.840.10008.1.2.4.70, SOF3 predictive — functions/jpeg.py)
    through the encapsulated-PixelData wrapper. LOSSLESS: unlike
    ``jpeg_roundtrip``, this must reproduce ANY corpus bit-exactly —
    no block-constant construction needed, and the differential gate
    checks exact pixel equality through the decode."""
    from ..functions import codecs as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                back = C.decode_dicom_gray(C.encode_dicom_jpeg_lossless(arr))
                out.append(
                    (r.img_id, back.tobytes(), str(back.dtype),
                     back.shape[0], back.shape[1])
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


def j2k_lossy_roundtrip_check(images: DataFrame,
                              delta: float = 1.0 / 64.0) -> DataFrame:
    """Pixels → irreversible-9/7 J2K DICOM encode (.4.91,
    functions/jpeg2000.py round 9) → decode → per-image error audit,
    inside the Arrow batch. Lossy, so the contract is a BOUND, not
    equality: emits (img_id, n_px, within_bound, syntax_ok) where
    within_bound asserts max |out − in| ≤ ceil(1.5·delta·2^prec) (the
    quality contract measured in test_jpeg2000) and syntax_ok asserts
    the blob really carries the .4.91 transfer syntax UID. Every row
    must come back (true, true) — the oracle states that closed-form,
    so any codec regression hash-mismatches the gate."""
    from ..functions import codecs as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(
                    r.pixels, dtype=np.dtype(r.dtype)
                ).reshape(r.height, r.width)
                blob = C.encode_dicom_j2k_lossy(arr, delta=delta)
                back = C.decode_dicom_gray(blob)
                prec = arr.dtype.itemsize * 8
                bound = int(np.ceil(1.5 * delta * (1 << prec)))
                err = int(
                    np.abs(
                        back.astype(np.int64) - arr.astype(np.int64)
                    ).max()
                )
                out.append(
                    (
                        int(r.img_id),
                        int(arr.size),
                        bool(err <= bound),
                        bool(b"1.2.840.10008.1.2.4.91" in blob
                             and back.dtype == arr.dtype),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["img_id", "n_px", "within_bound", "syntax_ok"],
            )

    return images.mapInPandas(
        run,
        "img_id long, n_px long, within_bound boolean, "
        "syntax_ok boolean",
    )


def jpegls_roundtrip(images: DataFrame, near: int = 0) -> DataFrame:
    """Pixels → JPEG-LS DICOM encode → decode → pixels, all inside the
    Arrow batch: the T.87/LOCO-I transfer syntaxes
    (1.2.840.10008.1.2.4.80 lossless / .4.81 near-lossless —
    functions/jpegls.py) through the encapsulated-PixelData wrapper.
    With ``near=0`` this must reproduce ANY corpus bit-exactly, same
    contract as ``jpeg_lossless_roundtrip``; with ``near>0`` the codec
    guarantees ``|out - in| <= near`` elementwise (asserted in tests,
    not oracle-checked — the reconstruction is encoder-specific)."""
    from ..functions import codecs as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                back = C.decode_dicom_gray(C.encode_dicom_jpegls(arr, near))
                out.append(
                    (r.img_id, back.tobytes(), str(back.dtype),
                     back.shape[0], back.shape[1])
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


def j2k_roundtrip(images: DataFrame, levels: int = 2) -> DataFrame:
    """Pixels → JPEG 2000 Lossless DICOM encode → decode → pixels,
    all inside the Arrow batch: transfer syntax 1.2.840.10008.1.2.4.90
    (reversible 5/3 + EBCOT/MQ — functions/jpeg2000.py) through the
    encapsulated-PixelData wrapper. LOSSLESS: must reproduce ANY
    corpus bit-exactly, same contract as ``jpeg_lossless_roundtrip``
    and ``jpegls_roundtrip``; closes the last compressed-DICOM family
    the reference reaches through pydicom
    (generate_images_from_dicom.py:44-51)."""
    from ..functions import codecs as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                back = C.decode_dicom_gray(C.encode_dicom_j2k(arr, levels))
                out.append(
                    (r.img_id, back.tobytes(), str(back.dtype),
                     back.shape[0], back.shape[1])
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


def multiframe_roundtrip_stats(spark: SparkSession, n: int = 40,
                               frames: int = 4, height: int = 9,
                               width: int = 7,
                               syntax: str = "j2k") -> DataFrame:
    """Multi-frame DICOM path (CT/MR series shape): synthesize a
    closed-form (F, H, W) uint16 stack per image id — pixel =
    (img_id*523 + frame*277 + i*659) % 65536 — encode it as ONE
    multi-frame DICOM (encapsulated, Basic Offset Table), decode with
    ``decode_dicom_frames``, and emit per-(img, frame) stats. The
    whole synth→encode→decode→stats chain runs inside the Arrow
    batch; a hash match against the closed-form oracle asserts exact
    per-frame recovery THROUGH the multi-frame container, which
    single-frame roundtrips cannot see (fragment/BOT bookkeeping).
    Reference behavior via pydicom's (F, H, W) ``pixel_array``
    (generate_images_from_dicom.py:48-51)."""
    from ..functions import codecs as C

    npx = height * width

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for img_id in pdf["id"].to_numpy():
                idx = np.arange(npx, dtype=np.int64)
                stack = np.stack([
                    ((img_id * 523 + f * 277 + idx * 659) % 65536)
                    .astype(np.uint16).reshape(height, width)
                    for f in range(frames)
                ])
                back = C.decode_dicom_frames(
                    C.encode_dicom_multiframe(stack, syntax)
                )
                for f in range(back.shape[0]):
                    fr = back[f].astype(np.int64)
                    out.append((
                        int(img_id), f, int(fr.sum()),
                        int(fr.min()), int(fr.max()),
                    ))
            yield pd.DataFrame(
                out,
                columns=["img_id", "frame_id", "sum_px", "min_px",
                         "max_px"],
            )

    return (
        spark.range(n)
        .repartition(8)
        .mapInPandas(
            run,
            "img_id long, frame_id int, sum_px long, min_px int, "
            "max_px int",
        )
    )


def pixel_stats(images: DataFrame) -> DataFrame:
    """Per-image pixel statistics — the feature-extraction stage of a
    multimodal pipeline, computed inside Arrow batches."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype))
                out.append(
                    (
                        r.img_id,
                        int(arr.sum(dtype=np.int64)),
                        float(round(arr.mean(), 6)),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["img_id", "sum_px", "mean_px", "min_px", "max_px"]
            )

    return images.mapInPandas(stats, STATS_SCHEMA)


def apply_kernel(images: DataFrame, op: str, variant: int = 0,
                 shift_max: int = 4, delta: int = 3,
                 interp: str = "nearest") -> DataFrame:
    """Run one augmentation pixel kernel over a multimodal column, with
    the engine's seeded-RNG convention. Returns the same schema with
    transformed pixels and a synthetic image id suffix (O19).
    ``delta`` parameterizes the deterministic ``brighten`` kernel;
    ``interp`` selects the scale kernel's interpolation order
    ("nearest" | "bilinear" | "cubic" — the last two are ndimage
    order-1/order-3 pixel parity, image_kernels.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                if op == "flip":
                    res = ik.flip_image(arr)
                elif op == "shift":
                    rng = ik.seeded_rng(str(r.img_id), variant, op)
                    rx = int(rng.integers(-shift_max, shift_max + 1))
                    ry = int(rng.integers(-shift_max, shift_max + 1))
                    res = ik.shift_image(arr, rx, ry)
                elif op == "scale":
                    rng = ik.seeded_rng(str(r.img_id), variant, op)
                    rf = float(rng.uniform(0.8, 1.25))
                    res = ik.scale_image(arr, rf, interp=interp)
                elif op == "brighten":
                    res = ik.brighten(arr, delta)
                else:
                    raise ValueError(f"unknown kernel op {op!r}")
                out.append(
                    (r.img_id, np.ascontiguousarray(res).tobytes(), r.dtype,
                     r.height, r.width)
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


def stage_dicom_fixture_dir(n: int = 40, height: int = 16,
                            width: int = 16) -> str:
    """Write a deterministic directory of real ``.dcm`` files (once) —
    the file-based input the reference job consumes (a dir of DICOMs,
    generate_images_from_dicom.py:70-78). pixel[i] of patient p is
    ``(p*31 + i*7) % 256``, the same closed form the synthetic corpus
    uses, so file-based results stay oracle-checkable."""
    import os
    import pathlib

    from ..functions.codecs import encode_dicom_gray

    d = pathlib.Path("/tmp/spark_graft_fixtures") / f"dicom_{n}_{height}x{width}"
    marker = d / ".complete"
    if not marker.exists():
        d.mkdir(parents=True, exist_ok=True)
        npx = height * width
        for pid in range(n):
            px = ((pid * 31 + np.arange(npx, dtype=np.int64) * 7) % 256)
            arr = px.astype(np.uint8).reshape(height, width)
            tmp = d / f".tmp_{pid:04d}"
            with open(tmp, "wb") as f:
                f.write(encode_dicom_gray(arr))
            os.replace(tmp, d / f"patient_{pid:04d}.dcm")
        marker.touch()
    return str(d)


def decode_dicom_batch(files: DataFrame) -> DataFrame:
    """(patient_id, content) rows → decoded pixel rows (O7 over a real
    binaryFile scan): the numeric image id derives from the patient-id
    suffix, decode runs inside the Arrow batch on executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = decode_dicom(bytes(r.content))
                out.append(
                    (int(str(r.patient_id).rsplit("_", 1)[-1]),
                     np.ascontiguousarray(arr).tobytes(), str(arr.dtype),
                     arr.shape[0], arr.shape[1])
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return files.mapInPandas(run, PIXELS_SCHEMA)


def codec_roundtrip(images: DataFrame) -> DataFrame:
    """O7+O10 in one verifiable chain: pixels → PNG encode → PNG decode →
    RLE-Lossless DICOM encode → decode → uncompressed DICOM encode →
    decode → pixels. All codecs execute inside the Arrow batch on
    executors; the output schema equals the input's, and because every
    format in the chain is lossless the pixels must come back
    bit-identical — which ``pixel_stats`` downstream hash-checks against
    the closed-form oracle. The RLE leg runs the PackBits
    encoder/decoder (codecs.py, PS3.5 Annex G) under the driver's
    correctness gate, not just unit tests."""
    from ..functions import codecs as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                via_png = C.decode_png_gray(encode_png(arr))
                via_rle = C.decode_dicom_gray(C.encode_dicom_rle(via_png))
                via_dcm = C.decode_dicom_gray(C.encode_dicom_gray(via_rle))
                out.append(
                    (r.img_id, via_dcm.tobytes(), str(via_dcm.dtype),
                     via_dcm.shape[0], via_dcm.shape[1])
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


def synth_block_images(spark: SparkSession, n: int = 150,
                       height: int = 16, width: int = 16) -> DataFrame:
    """n deterministic uint8 images, constant per 8x8 block:
    value = (img_id*37 + block_id*11) % 256, block_id row-major over
    the 8x8 grid. Purpose-built for the JPEG roundtrip gate: a
    constant block has only a DC coefficient, and the Annex-K DC
    quantizer at the default quality reconstructs it to < 0.5 gray
    levels — so even the LOSSY codec roundtrips these bit-exactly and
    the oracle stays a closed form."""
    bx = width // 8

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id in pdf["id"].to_numpy():
                yy, xx = np.mgrid[0:height, 0:width]
                blk = (yy // 8) * bx + (xx // 8)
                px = ((int(img_id) * 37 + blk * 11) % 256).astype(np.uint8)
                rows.append(
                    (int(img_id), px.tobytes(), "uint8", height, width)
                )
            yield pd.DataFrame(
                rows, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return spark.range(n).mapInPandas(gen, PIXELS_SCHEMA)


def jpeg_roundtrip(images: DataFrame) -> DataFrame:
    """Pixels → JPEG-Baseline DICOM encode → decode → pixels, all
    inside the Arrow batch: exercises the from-scratch T.81 codec
    (functions/jpeg.py) through the encapsulated-PixelData wrapper
    (transfer syntax 1.2.840.10008.1.2.4.50) under the differential
    gate. Lossy in general — callers feed block-constant synth images
    (``synth_block_images``) when they need bit-exact recovery."""
    from ..functions import codecs as C

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                back = C.decode_dicom_gray(C.encode_dicom_jpeg(arr))
                out.append(
                    (r.img_id, back.tobytes(), str(back.dtype),
                     back.shape[0], back.shape[1])
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


# ---------------------------------------------------------------------------
# resize (explicit-target variant of the zoom kernel)
# ---------------------------------------------------------------------------


def resize(images: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize of every image to (out_h, out_w) — the
    standard normalization step before batching multimodal training
    data. Index mapping is exact integer arithmetic (no interpolation
    library), deterministic across platforms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                ys = (np.arange(out_h) * r.height) // out_h
                xs = (np.arange(out_w) * r.width) // out_w
                res = arr[np.ix_(ys, xs)]
                out.append(
                    (r.img_id, np.ascontiguousarray(res).tobytes(), r.dtype,
                     out_h, out_w)
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


# ---------------------------------------------------------------------------
# video columns: frame sampling
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = (
    "vid_id long, frames binary, dtype string, n_frames int, "
    "height int, width int"
)
FRAME_SCHEMA = (
    "vid_id long, frame_idx int, pixels binary, dtype string, "
    "height int, width int"
)


def synth_videos(spark: SparkSession, n: int = 60, n_frames: int = 12,
                 height: int = 8, width: int = 8) -> DataFrame:
    """Deterministic synthetic videos: frame f, pixel j of video v is
    ``(v*131 + f*17 + j*7) % 256`` (uint8). The "codec" is raw
    frame-concatenation — a real pipeline swaps in an ffmpeg decode
    stub here; everything downstream (frame addressing, sampling,
    per-frame ops) is codec-agnostic."""
    npx = height * width

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf["id"].to_numpy():
                f = np.arange(n_frames, dtype=np.int64)[:, None]
                j = np.arange(npx, dtype=np.int64)[None, :]
                px = (int(vid) * 131 + f * 17 + j * 7) % 256
                rows.append(
                    (int(vid), px.astype(np.uint8).tobytes(), "uint8",
                     n_frames, height, width)
                )
            yield pd.DataFrame(
                rows,
                columns=["vid_id", "frames", "dtype", "n_frames", "height",
                         "width"],
            )

    return spark.range(n).mapInPandas(gen, VIDEO_SCHEMA)


def sample_frames(videos: DataFrame, stride: int = 3) -> DataFrame:
    """Every ``stride``-th frame of each video as its own row — the
    frame-sampling stage of a video training pipeline. Pure offset
    slicing into the binary payload (one row in, n_frames/stride rows
    out, all inside the Arrow batch; no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                frame_bytes = r.height * r.width * np.dtype(r.dtype).itemsize
                for f in range(0, r.n_frames, stride):
                    chunk = r.frames[f * frame_bytes:(f + 1) * frame_bytes]
                    out.append(
                        (r.vid_id, f, chunk, r.dtype, r.height, r.width)
                    )
            yield pd.DataFrame(
                out,
                columns=["vid_id", "frame_idx", "pixels", "dtype", "height",
                         "width"],
            )

    return videos.mapInPandas(run, FRAME_SCHEMA)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame statistics (sum/min/max) — closed-form checkable
    against the synthetic corpus."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype))
                out.append(
                    (r.vid_id, r.frame_idx, int(arr.sum(dtype=np.int64)),
                     int(arr.min()), int(arr.max()))
                )
            yield pd.DataFrame(
                out,
                columns=["vid_id", "frame_idx", "sum_px", "min_px", "max_px"],
            )

    return frames.mapInPandas(
        stats, "vid_id long, frame_idx int, sum_px long, min_px int, max_px int"
    )


# ---------------------------------------------------------------------------
# audio columns: waveform features
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = "clip_id long, samples binary, dtype string, n_samples int"


def synth_audio(spark: SparkSession, n: int = 100,
                n_samples: int = 2000) -> DataFrame:
    """Deterministic int16 "waveforms": sample i of clip c is
    ``((c*17 + i*13) % 2048) - 1024``. Stands in for a real audio
    decode (soundfile/librosa stub) with exactly the same binary+
    metadata column shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf["id"].to_numpy():
                i = np.arange(n_samples, dtype=np.int64)
                s = ((int(cid) * 17 + i * 13) % 2048) - 1024
                rows.append(
                    (int(cid), s.astype(np.int16).tobytes(), "int16",
                     n_samples)
                )
            yield pd.DataFrame(
                rows, columns=["clip_id", "samples", "dtype", "n_samples"]
            )

    return spark.range(n).mapInPandas(gen, AUDIO_SCHEMA)


def audio_features(clips: DataFrame) -> DataFrame:
    """Integer-exact waveform features: total energy (Σ s², int64) and
    zero-crossing count (sign flips between consecutive samples; zero
    counts as non-negative). Integer outputs keep the differential
    oracle exact — float features (RMS, dB) are one `sqrt`/`log` away
    downstream."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                s = np.frombuffer(r.samples, dtype=np.dtype(r.dtype)).astype(
                    np.int64
                )
                energy = int((s * s).sum())
                nonneg = s >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum())
                out.append((r.clip_id, energy, zc, r.n_samples))
            yield pd.DataFrame(
                out,
                columns=["clip_id", "energy", "zero_crossings", "n_samples"],
            )

    return clips.mapInPandas(
        feats,
        "clip_id long, energy long, zero_crossings long, n_samples int",
    )


# stage op-name → pixel-kernel sequence, mirroring the geometry chains in
# augmentation._op_chain_exprs (same stage vocabulary)
STAGE_KERNEL_CHAINS = {
    "shift_image": ("shift",),
    "shift_bbox": ("shift",),
    "scale_bbox": ("scale",),
    "scale_image": ("scale",),
    "scale_shift_bbox": ("scale", "shift"),
    "shift_image_shift_bbox": ("shift", "shift"),
    "scale_image_scale_shift_bbox": ("scale", "scale", "shift"),
}


def apply_stage_chain(images: DataFrame, stage_op: str,
                      variant: int = 0) -> DataFrame:
    """Pixel half of one augmentation stage: the stage's kernel sequence
    applied in order (each step seeded on (img_id, variant, op, step) via
    the shared RNG convention, so pixels and box geometry derived from
    the same keys stay in lock-step)."""
    out = images
    for step, op in enumerate(STAGE_KERNEL_CHAINS[stage_op]):
        out = apply_kernel(out, op, variant=variant * 10 + step)
    return out


# ---------------------------------------------------------------------------
# image tiling (ViT-style patch extraction)
# ---------------------------------------------------------------------------

PATCH_SCHEMA = (
    "img_id long, patch_row int, patch_col int, pixels binary, "
    "dtype string, height int, width int"
)


def tile_patches(images: DataFrame, patch: int = 8) -> DataFrame:
    """Split each image into non-overlapping patch×patch tiles, one row
    per tile — the vision-transformer data-prep step. Pure ndarray
    reshaping inside the Arrow batch (fan-out (H/p)·(W/p) per image, no
    shuffle); images must be divisible by ``patch`` (normalize with
    ``resize`` first)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                assert r.height % patch == 0 and r.width % patch == 0
                for pr in range(r.height // patch):
                    for pc in range(r.width // patch):
                        tile = arr[
                            pr * patch:(pr + 1) * patch,
                            pc * patch:(pc + 1) * patch,
                        ]
                        out.append(
                            (r.img_id, pr, pc,
                             np.ascontiguousarray(tile).tobytes(),
                             r.dtype, patch, patch)
                        )
            yield pd.DataFrame(
                out,
                columns=["img_id", "patch_row", "patch_col", "pixels",
                         "dtype", "height", "width"],
            )

    return images.mapInPandas(run, PATCH_SCHEMA)


def dhash_images(images: DataFrame, hash_h: int = 8,
                 hash_w: int = 8) -> DataFrame:
    """Difference hash (dHash) per image: downsample to
    ``hash_h × (hash_w+1)`` by index sampling (``yi = y*H // hash_h``,
    ``xi = x*W // (hash_w+1)``), one bit per adjacent-column comparison
    (left > right), row-major. Returned as a '0'/'1' string of
    ``hash_h*hash_w`` chars — engine-portable, directly groupable.

    This is the image-side near-dup key (X2×X7): invariant under
    brightness/contrast shifts that preserve pixel order, cheap enough
    to run inline in the decode pass, and groupable exactly like a text
    content hash — at 100 TB the dedup is one shuffle of 64-bit-string
    keys, never pixels. Hamming-banded blocking (the SimHash pigeonhole
    split) extends it to small-distortion matching."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype)).reshape(
                    r.height, r.width
                )
                yi = (np.arange(hash_h, dtype=np.int64) * r.height) // hash_h
                xi = (
                    np.arange(hash_w + 1, dtype=np.int64) * r.width
                ) // (hash_w + 1)
                s = arr[np.ix_(yi, xi)].astype(np.int64)
                bits = (s[:, :-1] > s[:, 1:]).astype(np.uint8).ravel()
                out.append(
                    (r.img_id, "".join("1" if b else "0" for b in bits))
                )
            yield pd.DataFrame(out, columns=["img_id", "dhash"])

    return images.mapInPandas(run, "img_id long, dhash string")


def shot_boundaries(videos: DataFrame, threshold: int = 1500) -> DataFrame:
    """Video shot-boundary detection: the L1 distance between
    consecutive frames, a cut wherever it exceeds ``threshold`` — the
    segmentation step a video training pipeline runs before sampling
    frames per shot (sampling per-video oversamples long static shots).

    A video's frames arrive as ONE binary row, so the frame-pair
    differencing is pure narrow work inside the Arrow batch: no
    shuffle, no explode of raw pixels; only the detected cut rows
    (video, frame index, distance) leave the executor. At 100 TB the
    output is boundary-sparse while the pixel payload never moves."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = (
                    np.frombuffer(r.frames, dtype=np.dtype(r.dtype))
                    .reshape(r.n_frames, r.height * r.width)
                    .astype(np.int64)
                )
                d = np.abs(np.diff(arr, axis=0)).sum(axis=1)
                for i, v in enumerate(d, start=1):
                    if v > threshold:
                        out.append((r.vid_id, i, int(v)))
            yield pd.DataFrame(out, columns=["vid_id", "frame_idx", "l1"])

    return videos.mapInPandas(run, "vid_id long, frame_idx int, l1 long")


def pixel_stats_arrow(images: DataFrame) -> DataFrame:
    """`pixel_stats` on the Arrow-native path (``mapInArrow``): batches
    arrive as ``pyarrow.RecordBatch``, so the ~1 MiB binary pixel
    payloads are processed zero-copy — no Arrow→pandas materialization
    of a `bytes` object per row (for binary-heavy rows the pandas
    conversion is the dominant per-batch cost; relational-sized rows
    don't care). Semantics identical to `pixel_stats`, pinned by
    `tests/test_multimodal_arrow.py`.

    This is the template for every decode/feature kernel here if the
    python-side cost ever dominates at 100 TB: same iterator shape,
    same bounded batches (arrow.maxRecordsPerBatch), RecordBatch in
    and out."""
    import pyarrow as pa

    def stats(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for b in batches:
            ids = b.column(b.schema.get_field_index("img_id"))
            px = b.column(b.schema.get_field_index("pixels"))
            dt = b.column(b.schema.get_field_index("dtype"))
            sums, means, mins, maxs = [], [], [], []
            for i in range(b.num_rows):
                # buffer-backed memoryview, no bytes copy
                arr = np.frombuffer(
                    px[i].as_buffer(), dtype=np.dtype(dt[i].as_py())
                )
                sums.append(int(arr.sum(dtype=np.int64)))
                means.append(float(round(arr.mean(), 6)))
                mins.append(int(arr.min()))
                maxs.append(int(arr.max()))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(sums, pa.int64()),
                    pa.array(means, pa.float64()),
                    pa.array(mins, pa.int32()),
                    pa.array(maxs, pa.int32()),
                ],
                names=["img_id", "sum_px", "mean_px", "min_px", "max_px"],
            )

    return images.mapInArrow(stats, STATS_SCHEMA)


def image_entropy(images: DataFrame) -> DataFrame:
    """Per-image Shannon entropy of the pixel histogram plus the distinct
    gray-level count — the classic blank/low-information frame detector
    a multimodal curation pipeline gates on (near-zero entropy = blank
    or synthetic fill; the signal pairs with dHash for cheap visual
    dedup triage). Computed in the Arrow batch with one bincount per
    image; rounded to 6 places so a closed-form oracle can re-derive it.
    Returns (img_id, n_levels, entropy_nats)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.pixels, dtype=np.dtype(r.dtype))
                counts = np.bincount(arr.astype(np.int64), minlength=0)
                counts = counts[counts > 0]
                p = counts / arr.size
                ent = float(-(p * np.log(p)).sum())
                out.append((int(r.img_id), int(counts.size),
                            round(ent, 6) + 0.0))
            yield pd.DataFrame(
                out, columns=["img_id", "n_levels", "entropy_nats"]
            )

    return images.mapInPandas(
        run, "img_id long, n_levels int, entropy_nats double"
    )


def audio_frame_features(clips: DataFrame, frame: int = 256) -> DataFrame:
    """Frame-level waveform features — the framing step every audio
    pipeline runs before any spectral transform: split each clip into
    fixed ``frame``-sample windows (full frames only; the ragged tail
    carries no complete window) and emit per-frame integer energy and
    zero-crossing counts.

    Same integer-exactness contract as ``audio_features``: Σs² and
    sign-flip counts are int64, so a closed-form synthetic corpus is
    re-derivable exactly by any engine. One Arrow-batched pass, output
    rows = clips × n_frames; the reshape is a numpy view (no copy),
    per-frame reductions vectorized over the frame axis.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                s = np.frombuffer(
                    r.samples, dtype=np.dtype(r.dtype)
                ).astype(np.int64)
                n_frames = len(s) // frame
                if n_frames == 0:
                    continue
                fr = s[: n_frames * frame].reshape(n_frames, frame)
                energy = (fr * fr).sum(axis=1)
                nonneg = fr >= 0
                zc = (nonneg[:, 1:] != nonneg[:, :-1]).sum(axis=1)
                for k in range(n_frames):
                    out.append(
                        (int(r.clip_id), k, int(energy[k]), int(zc[k]))
                    )
            yield pd.DataFrame(
                out,
                columns=["clip_id", "frame_idx", "energy", "n_zero_cross"],
            )

    return clips.mapInPandas(
        feats,
        "clip_id long, frame_idx int, energy long, n_zero_cross long",
    )


def hist_equalize_stats(images: DataFrame) -> DataFrame:
    """Per-image histogram equalization (the classic contrast
    normalizer: remap each gray level through the image's own CDF so
    levels spread over the full range) with integer-exact accounting:
    ``lut[v] = (cdf[v] − cdf_min)·255 // (npx − cdf_min)`` — pure
    integer floor arithmetic, so the equalized pixel sum and the
    post-equalization level count are bit-reproducible and a closed-
    form corpus is re-derivable by any engine.

    One numpy bincount + cumsum + LUT gather per image inside the
    Arrow batch — the same kernel shape OpenCV's equalizeHist runs,
    minus the float rounding that would break the differential gate.
    """

    def eq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = np.frombuffer(r.pixels, dtype=np.uint8).astype(
                    np.int64
                )
                npx = px.size
                hist = np.bincount(px, minlength=256)
                cdf = hist.cumsum()
                occupied = cdf[hist > 0]
                cdf_min = int(occupied[0]) if occupied.size else 0
                den = npx - cdf_min
                if den <= 0:  # constant image: everything maps to 0
                    eqpx = np.zeros_like(px)
                else:
                    lut = ((cdf - cdf_min).clip(min=0) * 255) // den
                    eqpx = lut[px]
                out.append(
                    (
                        int(r.img_id),
                        int(eqpx.sum()),
                        int(np.unique(eqpx).size),
                    )
                )
            yield pd.DataFrame(
                out, columns=["img_id", "eq_pixel_sum", "n_levels"]
            )

    return images.mapInPandas(
        eq, "img_id long, eq_pixel_sum long, n_levels int"
    )


def audio_silence_gate(
    clips: DataFrame,
    frame: int = 256,
    energy_threshold: int = 89_000_000,
) -> DataFrame:
    """VAD-style silence gate per clip — the audio-corpus quality
    filter: frame the waveform (``audio_frame_features``'s framing),
    call a frame "silent" when its integer energy Σs² falls below
    ``energy_threshold``, and report per-clip frame counts plus the
    silence ratio in ppm. Mostly-silent clips are dead weight in a
    speech corpus; an all-silent clip is usually a decode failure.

    Composition, not new kernel code: the Arrow-batched framing pass
    emits integer energies, and everything after is a JVM-side
    aggregation — so the gate inherits ``audio_frame_features``'s
    exactness (a closed-form synthetic corpus re-derives it in SQL)
    and its scale shape (one mapInPandas pass, one
    map-side-combined groupBy(clip)).
    """
    frames = audio_frame_features(clips, frame=frame)
    return (
        frames.groupBy("clip_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum(
                (F.col("energy") < energy_threshold).cast("long")
            )
            .cast("bigint")
            .alias("n_silent"),
        )
        .selectExpr(
            "clip_id",
            "n_frames",
            "n_silent",
            "CAST(n_silent * 1000000 DIV n_frames AS BIGINT) "
            "AS silence_ppm",
        )
    )


def plant_watermark(images: DataFrame, every: int = 5, tile_row: int = 1,
                    tile_col: int = 1, patch: int = 8,
                    mod: int = 200) -> DataFrame:
    """Overwrite one ``patch×patch`` tile of every ``every``-th image
    with a FIXED pattern (w[i] = i·13 % mod) — the deterministic stand-
    in for a corpus whose pages carry a shared logo/watermark. Pure
    narrow Arrow work; the closed-form pattern keeps the corpus fully
    SQL-rederivable (the multimodal oracle contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = np.frombuffer(
                    r.pixels, dtype=np.dtype(r.dtype)
                ).reshape(r.height, r.width).copy()
                if r.img_id % every == 0:
                    w = (
                        np.arange(patch * patch, dtype=np.int64) * 13 % mod
                    ).reshape(patch, patch).astype(px.dtype)
                    px[
                        tile_row * patch:(tile_row + 1) * patch,
                        tile_col * patch:(tile_col + 1) * patch,
                    ] = w
                out.append(
                    (r.img_id, px.tobytes(), r.dtype, r.height, r.width)
                )
            yield pd.DataFrame(
                out, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return images.mapInPandas(run, PIXELS_SCHEMA)


def patch_dhash(patches: DataFrame, hash_h: int = 8,
                hash_w: int = 8) -> DataFrame:
    """dHash per TILE, keyed by (img_id, patch_row, patch_col) — the
    region-level perceptual key behind watermark/logo detection: a
    patch hash repeating across many otherwise-distinct images at the
    same grid position is boilerplate imagery, the pixel analogue of a
    boilerplate n-gram. Same sampling/bit contract as
    ``dhash_images``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(
                    r.pixels, dtype=np.dtype(r.dtype)
                ).reshape(r.height, r.width)
                yi = (np.arange(hash_h, dtype=np.int64) * r.height) // hash_h
                xi = (
                    np.arange(hash_w + 1, dtype=np.int64) * r.width
                ) // (hash_w + 1)
                s = arr[np.ix_(yi, xi)].astype(np.int64)
                bits = (s[:, :-1] > s[:, 1:]).astype(np.uint8).ravel()
                out.append(
                    (r.img_id, r.patch_row, r.patch_col,
                     "".join("1" if b else "0" for b in bits))
                )
            yield pd.DataFrame(
                out, columns=["img_id", "patch_row", "patch_col", "dhash"]
            )

    return patches.mapInPandas(
        run, "img_id long, patch_row int, patch_col int, dhash string"
    )
