"""Bucketed vs shuffled three-way join A/B at a local 100x SF.

The 100 TB answer for `three_way_lookup_join` (VERDICT r9 #3): the
lineitem x orders join dominates the query's shuffle volume; bucketing
BOTH fact tables by orderkey at layout time (sinks/bucketed.py) makes
that join exchange-free — the one-time layout shuffle is amortized over
every subsequent orderkey join or aggregation. This script measures the
claim end-to-end:

  1. writes lineitem/orders from the sf10 replica as bucketed+sorted
     tables (one-time layout cost, reported separately),
  2. runs the SAME three-way revenue query from the registry against
     (a) the plain parquet layout (AQE shuffle plan) and (b) the
     bucketed tables,
  3. asserts the bucketed plan has ZERO Exchange under the
     lineitem-orders join (the sort too is elided — single file per
     bucket), and
  4. prints paired medians plus the DuckDB baseline for the same SQL.

Usage: python tools/bucketed_three_way_ab.py [sf_dir] [n_buckets]
       (defaults: .localdata/sf10, 32)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_rsna_spark import tables  # noqa: E402
from data_pipeline_rsna_spark.session import get_spark  # noqa: E402
from data_pipeline_rsna_spark.sinks.bucketed import write_bucketed  # noqa: E402


def three_way(li, orders, cust, nation):
    """Body of q_three_way_join over explicit inputs."""
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
                " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
                " AS DOUBLE) / 10000.0"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def med(mk, n=5):
    ts = []
    for _ in range(n):
        df = mk()
        t0 = time.time()
        df.collect()
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3), round(min(ts), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf10",
    )
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("bucketed_ab")

    def plain():
        li = tables.load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = tables.load(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "F"
        ).select("o_orderkey", "o_custkey")
        cust = tables.load(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
        nation = tables.load(spark, sf_dir, "nation")
        return three_way(li, orders, cust, nation)

    # --- one-time layout: bucket the two fact tables by orderkey ---
    t0 = time.time()
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    write_bucketed(
        tables.load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "li_bucketed", "l_orderkey", n_buckets,
    )
    write_bucketed(
        tables.load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        ),
        "orders_bucketed", "o_orderkey", n_buckets,
    )
    layout_s = round(time.time() - t0, 3)

    def bucketed():
        li = spark.table("li_bucketed")
        orders = spark.table("orders_bucketed").filter(
            F.col("o_orderstatus") == "F"
        ).select("o_orderkey", "o_custkey")
        cust = tables.load(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
        nation = tables.load(spark, sf_dir, "nation")
        return three_way(li, orders, cust, nation)

    # plan audit: the orderkey join must be exchange-free — no
    # hash-repartitioning on either orderkey column anywhere in the
    # bucketed plan (the only remaining Exchange is the custkey join's)
    bdf = bucketed()
    bdf.collect()  # finalize AQE
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    li_orders_clean = (
        "hashpartitioning(l_orderkey" not in plan
        and "hashpartitioning(o_orderkey" not in plan
        and "SelectedBucketsCount" in plan
    )

    p_med, p_min = med(plain)
    b_med, b_min = med(bucketed)

    # correctness: both layouts agree
    a = {tuple(r) for r in plain().collect()}
    b = {tuple(r) for r in bucketed().collect()}
    assert a == b, "bucketed plan changed the answer"

    print(json.dumps({
        "metric": "three_way_bucketed_ab",
        "sf_dir": sf_dir,
        "n_buckets": n_buckets,
        "layout_write_s": layout_s,
        "plain_med_s": p_med,
        "plain_min_s": p_min,
        "bucketed_med_s": b_med,
        "bucketed_min_s": b_min,
        "li_orders_exchange_free": li_orders_clean,
    }))


if __name__ == "__main__":
    main()
