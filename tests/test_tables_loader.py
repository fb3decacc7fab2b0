"""Generation-proof table loading: the driver has shipped events.ts as
INT64 epoch-nanos and as TIMESTAMP(MICROS)-NTZ across testdata
generations. The loader must normalize EVERY physical shape to the same
microsecond TimestampType instants — these tests fabricate each shape
and assert identical values, since the live testdata can only exercise
one shape at a time."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline_rsna_spark import tables

US = [1704067200_000_000 + i * 37_000_000 for i in range(8)]  # 2024-01-01 +


def _write_events(path, ts_array):
    t = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([i % 3 for i in range(8)], pa.int64()),
            "event_type": pa.array(["click"] * 8),
            "value": pa.array([float(i) for i in range(8)]),
            "props": pa.array(["{}"] * 8),
        }
    )
    pq.write_table(t, path)


@pytest.mark.parametrize(
    "kind,arr",
    [
        ("ntz", pa.array(US, pa.int64()).cast(pa.timestamp("us"))),
        ("nanos", pa.array([u * 1000 for u in US], pa.int64()).cast(
            pa.timestamp("ns"))),
        ("ltz", pa.array(US, pa.int64()).cast(pa.timestamp("us", tz="UTC"))),
        ("raw-int64-nanos", pa.array([u * 1000 for u in US], pa.int64())),
    ],
)
def test_events_loader_normalizes_every_generation(spark, tmp_path, kind, arr):
    d = tmp_path / kind
    d.mkdir()
    _write_events(str(d / "events.parquet"), arr)
    df = tables.load(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    import datetime

    want = sorted(
        datetime.datetime.fromtimestamp(u / 1e6, tz=datetime.timezone.utc)
        .replace(tzinfo=None)
        for u in US
    )
    assert got == want, kind


def test_events_ts_kind_sniffs_footer(tmp_path):
    cases = {
        "ntz": pa.array(US, pa.int64()).cast(pa.timestamp("us")),
        "nanos": pa.array([u * 1000 for u in US], pa.int64()).cast(
            pa.timestamp("ns")),
        "ltz": pa.array(US, pa.int64()).cast(pa.timestamp("us", tz="UTC")),
    }
    for kind, arr in cases.items():
        p = tmp_path / f"{kind}.parquet"
        _write_events(str(p), arr)
        assert tables.events_ts_kind(str(p)) == kind


def test_orders_ntz_dates_normalize(spark, sf_dir):
    """The generalization beyond events: o_orderdate/l_shipdate arrive
    as whatever the current generation uses and must come out LTZ."""
    orders = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp"
    assert dict(li.dtypes)["l_shipdate"] == "timestamp"


def test_tune_scan_splits_lowers_split_size_for_compressed_text(
    spark, tmp_path
):
    """Round 10: a multi-row-group, highly-compressed text file must
    lower the session split size so the scan parallelizes by row group
    (Spark's on-disk-byte sizing would hand 33:1-compressed text to
    1-2 tasks)."""
    # distinct-ish text per row: compressible enough to exercise the
    # ratio skew, but not so degenerate that the tuner's 64 KB
    # open-cost floor caps the split count below the row-group floor
    text = pa.array(
        [" ".join(format(i * 2654435761 + j, "x") for j in range(60))
         for i in range(40000)]
    )
    t = pa.table({"doc_id": pa.array(range(40000), pa.int64()),
                  "text": text})
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p), row_group_size=5000, compression="zstd")
    assert pq.ParquetFile(str(p)).metadata.num_row_groups >= 4
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_ocb = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        tables._tune_scan_splits(spark, str(p))
        # ONLY the open-cost floor moves; maxPartitionBytes is never
        # touched (lowering it session-wide shattered every later
        # big-table scan into sub-MB tasks — the r10 poisoning bug)
        assert (
            spark.conf.get("spark.sql.files.maxPartitionBytes") == old_mpb
        )
        new_ocb = int(
            str(spark.conf.get(
                "spark.sql.files.openCostInBytes")).rstrip("bB")
        )
        assert new_ocb < 4194304
        # splits now reach the row-group floor (or cores, if smaller)
        df = spark.read.parquet(str(p))
        want = min(
            pq.ParquetFile(str(p)).metadata.num_row_groups,
            spark.sparkContext.defaultParallelism,
        )
        assert df.rdd.getNumPartitions() >= want
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_ocb)


def test_tune_scan_splits_noop_on_single_row_group(spark, tmp_path):
    """A single-row-group file cannot scan-parallelize: the tuner must
    not LOWER anything for it — and must RESTORE the session baseline
    if a previous table had lowered the open-cost floor (r11 review:
    the first restore fix covered only one of the three early exits,
    so a single-row-group load could inherit a prior table's floor)."""
    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": pa.array(["short text"] * 100)})
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p))
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    baseline = tables._open_cost_baseline(spark)
    # simulate a prior fanout table having lowered the floor
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    tables._tune_scan_splits(spark, str(p))
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == old_mpb
    assert (
        spark.conf.get("spark.sql.files.openCostInBytes")
        == str(baseline)
    )


def test_parse_size_bytes():
    """Spark accepts unit-suffixed byte confs ('4m', '4MB', '1g'); the
    tuner's parser must handle every form Spark does and return None
    (skip tuning) on garbage instead of raising (ADVICE r10)."""
    p = tables._parse_size_bytes
    assert p("4194304") == 4194304
    assert p("4194304b") == 4194304
    assert p("4m") == 4 * 1024 * 1024
    assert p("4MB") == 4 * 1024 * 1024
    assert p(" 4 mb ") == 4 * 1024 * 1024
    assert p("1g") == 1 << 30
    assert p("2k") == 2048
    assert p(4194304) == 4194304
    assert p("four megs") is None
    assert p("4.5m") is None
    assert p("") is None


def _write_incompressible(path, n_rows=16000, row_group_size=2000):
    """A multi-row-group parquet whose text defeats compression, so the
    tuner's desired split size lands ABOVE a lowered floor."""
    rng = np.random.default_rng(7)
    text = pa.array(
        [rng.bytes(120).hex() for _ in range(n_rows)]
    )
    t = pa.table({"doc_id": pa.array(range(n_rows), pa.int64()),
                  "text": text})
    pq.write_table(t, str(path), row_group_size=row_group_size,
                   compression="zstd")


def test_tune_scan_splits_suffixed_conf_does_not_raise(spark, tmp_path):
    """A session where openCostInBytes was set with a unit suffix
    ('4m') must not break tables.load: the tuner parses it and tunes
    normally (ADVICE r10: int(str(v).rstrip('b')) raised ValueError)."""
    text = pa.array(["word " * 200] * 20000)
    t = pa.table({"doc_id": pa.array(range(20000), pa.int64()),
                  "text": text})
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p), row_group_size=2500, compression="zstd")
    old_ocb = spark.conf.get("spark.sql.files.openCostInBytes")
    app = spark.sparkContext.applicationId
    old_baseline = tables._OPEN_COST_BASELINE.pop(app, None)
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "4m")
        tables._tune_scan_splits(spark, str(p))  # must not raise
        new = tables._parse_size_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes"))
        assert new is not None and new < 4 * 1024 * 1024
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old_ocb)
        if old_baseline is not None:
            tables._OPEN_COST_BASELINE[app] = old_baseline
        else:
            tables._OPEN_COST_BASELINE.pop(app, None)


def test_tune_scan_splits_restores_baseline_no_ratchet(spark, tmp_path):
    """The tuner is non-monotone: after a compressed table lowers the
    open-cost floor, tuning a table that does NOT need a lowered floor
    restores the session baseline — the lowered value must not ratchet
    across unrelated later loads (ADVICE r10)."""
    compressed = tmp_path / "docs_compressed.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(range(20000), pa.int64()),
                  "text": pa.array(["word " * 200] * 20000)}),
        str(compressed), row_group_size=2500, compression="zstd",
    )
    incompressible = tmp_path / "docs_random.parquet"
    _write_incompressible(incompressible)
    old_ocb = spark.conf.get("spark.sql.files.openCostInBytes")
    app = spark.sparkContext.applicationId
    old_baseline = tables._OPEN_COST_BASELINE.pop(app, None)
    try:
        spark.conf.set("spark.sql.files.openCostInBytes", "131072")
        tables._tune_scan_splits(spark, str(compressed))
        lowered = tables._parse_size_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes"))
        assert lowered < 131072
        # sanity: the incompressible fixture's desired split size is
        # at or above the baseline, so this load must restore it
        want = min(
            pq.ParquetFile(str(incompressible)).metadata.num_row_groups,
            spark.sparkContext.defaultParallelism,
        )
        assert os.path.getsize(incompressible) // want >= 131072
        tables._tune_scan_splits(spark, str(incompressible))
        assert spark.conf.get(
            "spark.sql.files.openCostInBytes") == "131072"
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", old_ocb)
        if old_baseline is not None:
            tables._OPEN_COST_BASELINE[app] = old_baseline
        else:
            tables._OPEN_COST_BASELINE.pop(app, None)


def test_corpus_stride_footer_equals_spark_agg(spark, tmp_path):
    """_corpus_stride's footer-statistics path must equal the Spark
    aggregate it replaced, across multiple row groups and files."""
    from data_pipeline_rsna_spark import queries as q

    d = tmp_path / "sfx"
    d.mkdir()
    ids = list(range(1000, 4000, 7))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["w " * 5] * len(ids))})
    pq.write_table(t, str(d / "documents.parquet"), row_group_size=100)
    got = q._corpus_stride(spark, str(d))
    assert got == 1 + max(ids)
    # memoized: the same content answers from cache (same key)
    assert q._corpus_stride(spark, str(d)) == 1 + max(ids)
    # regenerated data at the SAME path must invalidate the cache —
    # the stride is correctness-bearing (planted-id disjointness), so
    # a stale value would reintroduce the r9 id-collision bug
    ids2 = list(range(0, 9000, 11))
    t2 = pa.table({"doc_id": pa.array(ids2, pa.int64()),
                   "text": pa.array(["w " * 5] * len(ids2))})
    pq.write_table(t2, str(d / "documents.parquet"), row_group_size=200)
    os.utime(d / "documents.parquet")  # ensure mtime moves even on
    # coarse-granularity filesystems
    assert q._corpus_stride(spark, str(d)) == 1 + max(ids2)
