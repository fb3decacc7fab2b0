"""As-of join and bucketed range join: boundary and tie semantics."""

from __future__ import annotations

import datetime as dt

from data_pipeline_rsna_spark.operators import temporal


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_backward_match_and_tie(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(30)), (3, 100, _ts(5)), (4, 200, _ts(20))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(10), 1.0), (100, _ts(20), 2.0), (200, _ts(25), 9.0)],
        "user_id long, ts timestamp, v double",
    )
    got = {
        r.event_id: r.v_asof
        for r in temporal.asof_join(left, right, key="user_id").collect()
    }
    assert got[1] == 1.0  # tie: right at same ts matches
    assert got[2] == 2.0  # latest of the two earlier rows
    assert got[3] is None  # nothing at-or-before
    assert got[4] is None  # right row is later


def test_range_join_half_open_bounds(spark):
    points = spark.createDataFrame(
        [(1, 5, _ts(0)), (2, 5, _ts(59, 59)), (3, 5, _ts(0) + dt.timedelta(hours=1)), (4, 6, _ts(30))],
        "pid long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, 5, _ts(0), _ts(0) + dt.timedelta(hours=1))],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    got = sorted(
        r.pid
        for r in temporal.range_join_bucketed(
            points, intervals, key="user_id", bucket_seconds=600
        ).collect()
    )
    # start inclusive (1), interior (2); end exclusive (3); wrong key (4)
    assert got == [1, 2]


def test_range_join_matches_theta_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_rsna_spark import tables

    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("iid"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
    )
    bucketed = {
        (r.event_id, r.iid)
        for r in temporal.range_join_bucketed(
            clicks, windows, key="user_id"
        ).collect()
    }
    naive = {
        (r.event_id, r.iid)
        for r in clicks.alias("c")
        .join(
            windows.alias("w"),
            (F.col("c.user_id") == F.col("w.user_id"))
            & (F.col("c.ts") >= F.col("w.start"))
            & (F.col("c.ts") < F.col("w.end")),
        )
        .select("c.event_id", "w.iid")
        .collect()
    }
    assert bucketed == naive and len(bucketed) > 0
