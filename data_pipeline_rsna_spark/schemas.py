"""Explicit StructType schemas for every table the engine touches.

The reference enforces schemas nowhere (CSV columns positional,
``generate_images_from_dicom.py:23-30``; dims hardcoded,
``generate_images_from_dicom.py:49``). The engine declares everything:
no ``inferSchema``, ever — on 100 TB an inference pass is a full extra
scan, and a drifting inferred type silently changes query semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-shaped inputs (FIXTURES.md F1-F7)
# ---------------------------------------------------------------------------

# F1: stage_1_train_labels.csv — one row per box; x/y/w/h arrive as string
# numerals and get int(float(s)) truncation casts (SURVEY.md O2).
LABELS_CSV = T.StructType(
    [
        T.StructField("patientId", T.StringType(), False),
        T.StructField("x", T.StringType(), True),
        T.StructField("y", T.StringType(), True),
        T.StructField("width", T.StringType(), True),
        T.StructField("height", T.StringType(), True),
        T.StructField("Target", T.StringType(), False),
    ]
)

# Typed form after ingest (operators/labels.py)
LABELS = T.StructType(
    [
        T.StructField("patient_id", T.StringType(), False),
        T.StructField("x", T.IntegerType(), True),
        T.StructField("y", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("target", T.StringType(), False),
    ]
)

# F2: multimodal image corpus — binaryFile source + decoded pixel payload.
# Spark has no tensor type: pixels ride as BinaryType + dtype/shape columns.
IMAGES = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("patient_id", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("pixels", T.BinaryType(), True),
        T.StructField("dtype", T.StringType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
    ]
)

# F3/F4: annotation documents (the JSON handoff files of the reference;
# in-engine these stay DataFrames end-to-end).
OBJECT_ANNOTATIONS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField(
            "boxes", T.ArrayType(T.ArrayType(T.IntegerType())), True
        ),
    ]
)

CAPTION_ANNOTATIONS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
    ]
)

# F5: label-map dimension table (proto StringIntLabelMapItem).
LABEL_MAP = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("display_name", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided star schema (FIXTURES.md F9) — declared, not inferred.
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

# The driver's events parquet has shipped ts in two physical shapes across
# testdata generations: TIMESTAMP(NANOS) (which Spark's parquet reader only
# accepts as a long via spark.sql.legacy.parquet.nanosAsLong) and plain
# TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
# TIMESTAMP_NTZ). Loaders sniff the footer and normalize either shape to
# microsecond TimestampType in a UTC session — the exact instants DuckDB
# produces for the same file, so differential checks on time arithmetic
# stay exact. EVENTS_RAW_NANOS / EVENTS_RAW_TS_NTZ are the two raw source
# schemas; EVENTS is the normalized shape every operator consumes.
EVENTS_RAW_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),  # ns since epoch
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS_RAW_TS_NTZ = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

STAR_SCHEMA = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
