"""Physical-plan contract tests: pushdown, pruning, broadcast, codegen.

These pin the *shape* of the plans, not timings — the properties that
decide whether a query survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_rsna_spark import tables
from data_pipeline_rsna_spark.plans import audit
from data_pipeline_rsna_spark.queries import REGISTRY


def test_three_way_join_broadcasts_dims_and_pushes_filter(spark, sf_dir):
    df = REGISTRY["three_way_lookup_join"].spark_fn(spark, sf_dir)
    rep = audit.plan_report(df)
    # dims (orders-filtered, customer, nation) build broadcast sides;
    # the fact table must NOT shuffle for the joins
    assert rep.n_broadcast_hash_joins >= 3, rep.text
    assert rep.n_sort_merge_joins == 0, rep.text
    audit.assert_filter_pushed(df, "o_orderstatus")


def test_labels_ingest_prunes_lineitem_columns(spark, sf_dir):
    df = REGISTRY["labels_ingest"].spark_fn(spark, sf_dir)
    # pipeline touches 6 of lineitem's 16 columns; the scan must too
    audit.assert_columns_pruned(df, "l_orderkey", 6)


def test_pricing_summary_single_shuffle(spark, sf_dir):
    df = REGISTRY["pricing_summary"].spark_fn(spark, sf_dir)
    rep = audit.plan_report(df)
    # scan -> partial agg -> one exchange -> final agg (+ optional sort).
    # (codegen ids appear only in executed/final AQE plans, so the span
    # count is reported by plan_report but not asserted here.)
    assert rep.n_shuffle_exchanges <= 2, rep.text


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    audit.assert_filter_pushed(df, "GreaterThan(l_quantity")
    audit.assert_columns_pruned(df, "l_orderkey", 2)


def test_dedup_exact_shuffles_hashes_not_documents(spark, sf_dir):
    df = REGISTRY["dedup_exact"].spark_fn(spark, sf_dir)
    rep = audit.plan_report(df)
    # one aggregation shuffle; no join machinery at all
    assert rep.n_sort_merge_joins == 0
    assert rep.n_broadcast_hash_joins == 0
