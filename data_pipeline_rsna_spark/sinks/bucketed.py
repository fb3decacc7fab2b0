"""Bucketed-table layout: the exchange-free co-located join (SCALING.md).

At 100 TB the single most expensive repeated cost in a star-schema
workload is re-shuffling the same fact table on the same join key for
every query. Spark's answer is storage bucketing: ``bucketBy(n, key)``
at write time hash-partitions rows into a fixed number of files per
partition and records the layout in the catalog, so every later join or
aggregation on that key reads the bucket files as already-clustered
input — the planner drops BOTH Exchange nodes of a sort-merge join and
the shuffle of a groupBy. One shuffle is paid once at layout time, then
amortized over every query that touches the key.

Rules the helpers below encode (and `tests/test_bucketing.py` pins):

- Both sides of a join must be bucketed INTO THE SAME BUCKET COUNT on
  the join key; mismatched counts re-shuffle the smaller side (Spark
  can coalesce 2x counts when ``bucketing.coalesceBucketsInJoin`` is
  on, but same-count is the predictable contract).
- ``sortBy`` the key too: bucket files arrive pre-sorted, so the
  sort-merge join also skips its Sort — the join becomes a pure
  streaming zip of bucket pairs.
- Bucket count is a layout-time commitment: size it so one bucket of
  the BIGGEST table a key joins against fits an executor core's
  working set (~128-256 MB compressed). 100 TB / 256 MB ≈ 400k would
  exceed sane file counts — in practice combine with date partitioning
  (``partitionBy(day) + bucketBy(1024, key)``) so the product stays
  bounded and time-range queries prune partitions first.

Cite: reference pipeline re-reads its inputs per stage
(generate_images_from_dicom.py's per-stage directory walks); bucketing
is the Spark-native answer to that re-read amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table (managed, or
    external at ``path`` — the warehouse dir is a static conf, so tests
    and ad-hoc layouts pass an explicit location).

    The one-time shuffle this write pays (hash on ``key`` into
    ``n_buckets``) is exactly the shuffle every subsequent join on
    ``key`` no longer pays.

    The explicit ``repartition(n_buckets, key)`` below matters for the
    sort elision: Spark's bucket id and its hash-repartitioning use the
    same Murmur3+pmod formula, so after it each write task holds exactly
    one bucket and emits ONE file per bucket. Readers only trust (and
    reuse) the ``sortBy`` ordering when a bucket is a single file —
    multi-file buckets would need a merge, so the planner re-sorts."""
    df = df.repartition(n_buckets, key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    With bucketing metadata present the planner emits a sort-merge join
    with NO Exchange on either side (and no Sort when the tables were
    ``sortBy`` the key) — reading the matching bucket-file pairs
    side-by-side. Joining on anything other than the bucket key falls
    back to a normal shuffled join; that is Spark semantics, not an
    error."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on=key, how=how)
