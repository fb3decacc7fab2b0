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

Codec stubs: this container has no pydicom/PIL, so ``decode_dicom`` and
``encode_png`` are import-gated — real when the libraries exist,
``NotImplementedError`` otherwise. Everything around them (schemas,
batching, partitioning, kernel application) is real and tested via the
deterministic synthetic corpus below.
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
    """DICOM bytes → pixel array (O7). Real when pydicom is installed."""
    try:
        import io

        import pydicom  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env without pydicom
        raise NotImplementedError(
            "pydicom not available in this environment; decode_dicom is a "
            "stub. The surrounding plumbing (binary column + metadata + "
            "mapInPandas batching) is exercised with synthetic pixels."
        ) from e
    return pydicom.dcmread(io.BytesIO(content)).pixel_array


def encode_png(arr: np.ndarray) -> bytes:
    """ndarray → PNG bytes (O10). Real when PIL is installed."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "PIL not available; encode_png is a stub (see decode_dicom)."
        ) from e
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


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
                 width: int = 16) -> DataFrame:
    """n deterministic uint8 images: pixel[i] = (img_id*31 + i*7) % 256.
    Closed-form per pixel, so any engine can recompute the expected
    statistics exactly — this is what makes the pandas-UDF plumbing
    oracle-checkable."""
    npx = height * width

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for img_id in ids:
                px = (img_id * 31 + np.arange(npx, dtype=np.int64) * 7) % 256
                rows.append(
                    (int(img_id), px.astype(np.uint8).tobytes(), "uint8",
                     height, width)
                )
            yield pd.DataFrame(
                rows, columns=["img_id", "pixels", "dtype", "height", "width"]
            )

    return spark.range(n).mapInPandas(gen, PIXELS_SCHEMA)


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
                 shift_max: int = 4) -> DataFrame:
    """Run one augmentation pixel kernel over a multimodal column, with
    the engine's seeded-RNG convention. Returns the same schema with
    transformed pixels and a synthetic image id suffix (O19)."""

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
                    res = ik.scale_image(arr, rf)
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
