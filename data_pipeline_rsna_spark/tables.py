"""Loading helpers for the driver-provided star schema.

Parquet is the engine's canonical storage: columnar, min/max-pruned,
predicate-pushdown-capable. ``load`` reads one table; ``load_all``
returns the dict most operators take.

``load`` memoizes the *analyzed DataFrame* per (session, dir, table) —
the metastore analogue. ``spark.read.parquet`` resolves the schema
eagerly (a footer read + file listing per call, ~100 ms measured), so an
engine that re-infers it on every query construction pays catalog cost a
real warehouse pays once. Only the logical plan is cached; no DATA is
ever cached here (a 100 TB fact table must never be blanket-cached —
callers decide what to persist).
"""

from __future__ import annotations

import os
import re

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

# Tables whose per-row downstream work is EXPLOSIVE (token/shingle
# explode, vector arithmetic): a parquet scan's task count is sized by
# on-disk bytes and row groups, which undercounts post-explode work by
# orders of magnitude (dictionary-encoded text compresses ~100:1; a 50k
# -doc corpus arrives as one 877 KB row group = ONE scan task, then
# explodes to ~25M token rows inside that single task — measured: a
# partial aggregation over that fan-out serialized a whole sweep).
# When such a table arrives as a near-unsplittable scan, ``load``
# round-robin rebalances it to cluster parallelism BEFORE operators fan
# it out. At production scale these tables have thousands of splits and
# the guard never fires — it exists for exactly the small-file
# degenerate case that local SFs (and real-world over-compacted text
# corpora) exhibit.
#
# `embeddings` is deliberately NOT here: float arrays store ~raw
# (4 bytes/value, no 100:1 dictionary win), so scan bytes already track
# downstream FLOPs, and every vector kernel is numpy-batch per
# partition (matmul/Gram/quantize) — forcing a 0.5 MB scan onto 32
# tasks just pays 32 Python+Arrow task floors to move ~60 rows each
# (measured: exact cosine top-k 2.3x slower rebalanced at sf0.1).
FANOUT_TABLES = frozenset({"documents"})


# Columns that have shipped as raw int64 epoch-NANOS in at least one
# testdata generation (read as long under the nanosAsLong legacy conf).
_EPOCH_NANOS_COLS = frozenset({"ts"})


# (application id, realpath(sf_dir), table) -> analyzed DataFrame.
# DataFrames are immutable, so handing the same object to every caller is
# safe; each query builds its own plan on top of it. Keyed by the Spark
# applicationId — unique per SparkContext — not id(spark): Python reuses
# object ids after GC, so a stopped-and-recreated session could otherwise
# be served plans bound to the dead JVM context.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``,
    normalizing temporal columns to microsecond TimestampType in a UTC
    session. The driver has regenerated the testdata with different
    physical timestamp types across rounds (INT64 nanos, then micros
    NTZ) — normalizing at the scan keeps every downstream operator and
    every recorded oracle hash stable under any future regeneration."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    rebalance = (
        spark.conf.get("spark.graft.fanoutRebalance", "true") == "true"
    )
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        name,
        rebalance,
    )
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if rebalance and name in FANOUT_TABLES:
        _tune_scan_splits(spark, f"{sf_dir}/{name}.parquet")
    raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    out = _normalize_temporal(raw)
    if rebalance and name in FANOUT_TABLES:
        parts = out.rdd.getNumPartitions()
        cores = spark.sparkContext.defaultParallelism
        if parts * 4 <= cores:
            out = out.repartition(cores)
    _LOAD_CACHE[key] = out
    return out


def _tune_scan_splits(spark: SparkSession, path: str) -> None:
    """Decoded-size-aware scan split sizing (round 10).

    Spark sizes file splits by ON-DISK bytes
    (``spark.sql.files.maxPartitionBytes``, floored per-split by
    ``openCostInBytes``). Dictionary/zstd-compressed text defeats that:
    the sf10 documents table is 148 MB decoded but 4.5 MB on disk
    (~33:1), so the default sizing hands the whole scan to TWO tasks —
    each decoding ~74 MB of text serially — while 30 cores idle.
    Measured: scan+aggregate 0.87 s → 0.37 s once splits track decoded
    bytes (dedup_exact end-to-end 2.16 s → ~1.0 s at sf10). At 100 TB
    the same skew is an executor-memory hazard, not just a slowdown: a
    128 MB-on-disk split of 33:1 text decodes to ~4 GB in one task.

    Rule: aim for one split per row group up to cluster parallelism —
    row groups are the intra-file parallelism floor (the parquet reader
    assigns each row group to the split holding its start offset), and
    a table whose file count already ≥ cores is untouched because the
    default sizing then reaches ``want`` splits on its own (the ≥
    comparison below), so this is a no-op exactly where real-scale
    layouts live. Footer metadata only (pyarrow, driver-side, no job;
    ≤8 footers sampled and extrapolated), mirroring events_ts_kind.

    The conf key is session-global and read at physical planning time,
    and planning happens per ACTION, not per read — a query mixing a
    documents scan with a lineitem scan plans both under one conf
    value, so true per-read scoping is impossible (verified: pyspark
    4.1.2 ignores `openCostInBytes`/`maxPartitionBytes` as
    DataFrameReader options). Accepted contract (round 11): the tuner
    is non-monotone — each FANOUT-table load sets the floor to
    ``min(needed, session baseline)`` and RESTORES the baseline when
    the table doesn't need a lowered floor, so the last fanout load
    wins and nothing ratchets permanently; between fanout loads the
    lowered floor is visible to other scans, whose split sizing it can
    only shrink padding for (the ``totalBytes/cores`` term, not this
    floor, drives big-table splits — see below).
    Crucially, ONLY ``openCostInBytes`` is lowered — never
    ``maxPartitionBytes``. Spark's split formula is
    ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/cores))``:
    the ``totalBytes/cores`` term already adapts split size per TABLE,
    so a big low-compression table (lineitem: 1.4 GB → 43 MB/core)
    keeps its sizing no matter what this sets — the ONLY thing that
    serializes a small-on-disk compressed text scan is the 4 MB
    openCost floor. (The first r10 draft lowered maxPartitionBytes
    session-wide; at sf10 that shattered every LATER lineitem scan
    into ~1500 sub-MB tasks — measured as inflated three-way/pricing
    rows in the same bench JVM. Lowering the floor instead is
    per-table-safe by construction.) Only ``documents``-class tables
    (FANOUT_TABLES) trigger the check.
    """
    import pathlib

    import pyarrow.parquet as pq

    p = pathlib.Path(path)
    baseline = _open_cost_baseline(spark)
    if baseline is None:
        return  # un-parseable user setting: leave the session alone

    def _restore():
        # every this-table-needs-no-lowering exit RESTORES the session
        # baseline rather than leaving a previous table's lower value
        # in place (round 11: the first version only ever lowered, a
        # monotone ratchet that silently re-partitioned every later
        # scan in the session — and its first fix restored on only ONE
        # of the three early exits; ADVICE r10 + r11 review)
        spark.conf.set("spark.sql.files.openCostInBytes", str(baseline))

    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    files = [f for f in files if f.is_file()]
    if not files:
        _restore()
        return
    sample = files[:8]
    rg = 0
    for f in sample:
        rg += pq.ParquetFile(f).metadata.num_row_groups
    rg_total = int(rg * (len(files) / len(sample)))
    disk_total = sum(os.path.getsize(f) for f in files)
    cores = spark.sparkContext.defaultParallelism
    want = min(rg_total, cores)
    if want <= 1:
        _restore()  # single row group: splitting cannot help
        return
    desired = max(disk_total // want, 64 * 1024)
    if desired >= baseline:
        _restore()
        return
    spark.conf.set("spark.sql.files.openCostInBytes", str(desired))


# first-seen openCostInBytes per application — the value the tuner
# restores to when a table does not need a lowered floor. Keyed by
# applicationId so a new session re-reads the user's own setting.
_OPEN_COST_BASELINE: dict[str, int | None] = {}


def _open_cost_baseline(spark: SparkSession) -> int | None:
    app = spark.sparkContext.applicationId
    if app not in _OPEN_COST_BASELINE:
        cur = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        _OPEN_COST_BASELINE[app] = _parse_size_bytes(cur)
    return _OPEN_COST_BASELINE[app]


_SIZE_SUFFIXES = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_size_bytes(value: object) -> int | None:
    """Parse a Spark byte-size conf value ('4194304', '4m', '4MB',
    '1g') into bytes, mirroring JavaUtils.byteStringAsBytes (binary
    multiples, case-insensitive, bare number = bytes). Returns None on
    anything un-parseable instead of raising — the tuner is an
    optimization and must never break ``tables.load`` because a user
    set the conf with a suffix (round 11, ADVICE r10: the old
    ``int(str(v).rstrip('b'))`` raised ValueError on '4m')."""
    s = str(value).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([a-z]*)", s)
    if not m or m.group(2) not in _SIZE_SUFFIXES:
        return None
    return int(m.group(1)) * _SIZE_SUFFIXES[m.group(2)]


def _normalize_temporal(df: DataFrame) -> DataFrame:
    """Bring every temporal column to microsecond TimestampType:
    TIMESTAMP_NTZ wall-clocks are interpreted as UTC (hash-neutral in a
    UTC session), and known epoch-nanos longs truncate via DIV 1000 —
    DuckDB's own truncation, keeping time arithmetic engine-identical."""
    from pyspark.sql import functions as F

    out = df
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            out = out.withColumn(col, F.col(col).cast("timestamp"))
        elif dtype == "bigint" and col in _EPOCH_NANOS_COLS:
            out = out.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} DIV 1000"))
            )
    return out


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
    """Events-stream alias of ``_normalize_temporal`` (streaming readers
    declare their raw schema, then normalize through this)."""
    return _normalize_temporal(df)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
