"""Query registry: the driver-checkable surface of the engine.

Every implemented operator from SURVEY.md §2 gets one ``QuerySpec`` here:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (for the [Q]
operators) the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet. ``__spark_entry__.py`` re-exports this registry.

Cross-engine determinism rules (every query obeys these):
- Output columns are ints, strings, or **explicitly rounded** doubles —
  raw float aggregates differ between engines in the last ulp.
- No raw timestamps in output — epoch seconds / formatted strings.
- Collected lists are canonicalized: sorted, then joined to a string
  (Spark ``sort_array``+``array_join`` == DuckDB ``string_agg(... ORDER
  BY ...)``) so order-insensitive hashing sees identical scalars.
- ``int(float(s))`` truncation (reference semantics) = Spark
  ``cast double->int``; DuckDB casts *round*, so oracles use ``trunc()``.
- Spark ``pmod`` == DuckDB ``%`` only for non-negative operands; key
  synthesis keeps operands non-negative.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tables
from .operators import labels as labels_ops


@dataclass
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        REGISTRY[name] = QuerySpec(fn, oracle, doc, tags)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared synthesis: a labels-shaped table derived from lineitem.
#
# The driver testdata has no labels CSV, so the labels pipeline runs over a
# deterministic projection of lineitem with the same shape: patient_id (one
# per order), string-numeral box coords, a '0'/'1' target. All arithmetic is
# IEEE-double and integer-modulo, bit-identical across engines.
# ---------------------------------------------------------------------------

_LABELS_FROM_LINEITEM_SQL = """
    SELECT CAST(l_orderkey AS VARCHAR) AS patient_id,
           CAST(trunc(CAST((l_partkey * 7) % 800 AS DOUBLE) + 0.5) AS INTEGER) AS x,
           CAST(trunc(CAST((l_suppkey * 13) % 800 AS DOUBLE) + 0.25) AS INTEGER) AS y,
           CAST(trunc(l_quantity * 3.7) AS INTEGER) AS width,
           CAST(trunc(l_extendedprice / 300.0) AS INTEGER) AS height,
           CASE WHEN l_discount >= 0.05 THEN '1' ELSE '0' END AS target
    FROM lineitem
"""


def _lineitem_as_raw_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → the raw (all-string) labels CSV shape of FIXTURES.md F1,
    so the real O2 typed-projection code path runs on driver data."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("patientId"),
        (F.pmod(F.col("l_partkey") * 7, F.lit(800)).cast("double") + F.lit(0.5))
        .cast("string")
        .alias("x"),
        (F.pmod(F.col("l_suppkey") * 13, F.lit(800)).cast("double") + F.lit(0.25))
        .cast("string")
        .alias("y"),
        (F.col("l_quantity") * 3.7).cast("string").alias("width"),
        (F.col("l_extendedprice") / 300.0).cast("string").alias("height"),
        F.when(F.col("l_discount") >= 0.05, "1").otherwise("0").alias("Target"),
    )


def _box_sig(boxes_col: str = "boxes") -> F.Column:
    """array<array<int>> → canonical 'x,y,w,h;x,y,w,h' string (sorted)."""
    return F.array_join(
        F.transform(
            F.col(boxes_col),
            lambda b: F.array_join(
                F.transform(b, lambda v: v.cast("string")), ","
            ),
        ),
        ";",
    )


# ---------------------------------------------------------------------------
# Flagship: O1+O2+O3+O4+O5 — the reference's create_maps as one lazy DAG.
# ---------------------------------------------------------------------------


@register(
    "labels_ingest",
    oracle=f"""
    WITH labels AS ({_LABELS_FROM_LINEITEM_SQL}),
    boxes AS (
        SELECT patient_id,
               count(*) AS n_boxes,
               string_agg(
                   x || ',' || y || ',' || width || ',' || height, ';'
                   ORDER BY x, y, width, height
               ) AS box_sig
        FROM labels
        WHERE CAST(target AS INTEGER) <> 0
        GROUP BY patient_id
    ),
    captions AS (
        SELECT patient_id, max(target) AS target FROM labels GROUP BY patient_id
    )
    SELECT c.patient_id AS patient_id,
           c.target AS target,
           COALESCE(b.n_boxes, 0) AS n_boxes,
           COALESCE(b.box_sig, '') AS box_sig
    FROM captions c LEFT JOIN boxes b USING (patient_id)
    """,
    doc="O1-O5 create_maps (generate_images_from_dicom.py:15-41): typed "
    "projection + int(float()) casts + positives filter + per-patient "
    "box collect + per-patient target, as one lazy DataFrame DAG.",
    tags=("core", "flagship"),
)
def q_labels_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _lineitem_as_raw_labels(spark, sf_dir)
    labels = labels_ops.typed_labels(raw)
    ann = labels_ops.patient_annotations(labels)
    return ann.select(
        "patient_id",
        "target",
        "n_boxes",
        _box_sig().alias("box_sig"),
    )
