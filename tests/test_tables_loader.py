"""Generation-proof table loading: the driver has shipped events.ts as
INT64 epoch-nanos and as TIMESTAMP(MICROS)-NTZ across testdata
generations. The loader must normalize EVERY physical shape to the same
microsecond TimestampType instants — these tests fabricate each shape
and assert identical values, since the live testdata can only exercise
one shape at a time."""

from __future__ import annotations

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
    leave the session confs alone (the sf<=0.1 regime)."""
    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": pa.array(["short text"] * 100)})
    p = tmp_path / "documents.parquet"
    pq.write_table(t, str(p))
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_ocb = spark.conf.get("spark.sql.files.openCostInBytes")
    tables._tune_scan_splits(spark, str(p))
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == old_mpb
    assert spark.conf.get("spark.sql.files.openCostInBytes") == old_ocb


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
    # memoized: a second call with a deleted file still answers
    (d / "documents.parquet").unlink()
    assert q._corpus_stride(spark, str(d)) == 1 + max(ids)
