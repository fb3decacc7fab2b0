"""Loading helpers for the driver-provided star schema.

Parquet is the engine's canonical storage: columnar, min/max-pruned,
predicate-pushdown-capable. ``load`` reads one table; ``load_all``
returns the dict most operators take. No caching here — callers decide
what to cache (a 100 TB fact table must never be blanket-cached; small
dimensions benefit from it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables small enough to broadcast at any scale factor: the TPC-H dims
# region/nation are bounded by the world's geography, not by SF.
BROADCASTABLE_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_ts_kind(path: str) -> str:
    """Sniff the physical type of ``ts`` in an events parquet file (or a
    directory of part files) from the footer, without a Spark job:
    ``'nanos'`` (INT64 TIMESTAMP(NANOS) — Spark reads it as a long under
    the nanosAsLong legacy conf), ``'ntz'`` (TIMESTAMP(MICROS/MILLIS)
    not adjusted to UTC — Spark reads TIMESTAMP_NTZ), or ``'ltz'``
    (UTC-adjusted — Spark reads TimestampType). The driver's testdata
    has shipped both 'nanos' and 'ntz' across generations, so loaders
    must not assume either."""
    import pathlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = pathlib.Path(path)
    if p.is_dir():
        parts = sorted(p.glob("*.parquet")) or sorted(p.glob("part-*"))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        p = parts[0]
    t = pq.read_schema(p).field("ts").type
    if pa.types.is_timestamp(t):
        if t.unit == "ns" and t.tz is None:
            return "nanos"
        return "ltz" if t.tz is not None else "ntz"
    return "nanos"  # stored as a raw int64 epoch-nanos column


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize whatever raw shape ``ts`` arrived in to microsecond
    TimestampType. Instants are identical to DuckDB's read of the same
    file in a UTC session: nanos truncate (DIV 1000, DuckDB's own
    truncation), NTZ wall-clocks are interpreted as UTC."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":  # epoch nanos read under nanosAsLong
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing ts to microsecond
    TimestampType regardless of the file's physical timestamp type."""
    # Both confs are no-ops when the file is already micros; they make
    # the nanos generation readable and the NTZ→LTZ cast deterministic.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_events_ts(raw)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
