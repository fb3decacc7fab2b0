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


def test_late_arrival_audit_hand_computed(spark):
    """Three events in one hour window, arrival order planted so the
    middle one is late and one drops under a 60 s allowance."""
    from data_pipeline_rsna_spark.operators import events as ev_ops

    rows = [
        # (arrival_seq, ts) — arrival 2 carries an event 2 hours old
        (1, dt.datetime(2024, 1, 1, 12, 0, 0)),
        (2, dt.datetime(2024, 1, 1, 10, 30, 0)),  # hwm 12:00 → late 90m
        (3, dt.datetime(2024, 1, 1, 12, 5, 0)),
        (4, dt.datetime(2024, 1, 1, 11, 59, 0)),  # late 6m, window
        # closed 12:00, hwm 12:05 - 60s allowance > 12:00 → dropped
    ]
    df = spark.createDataFrame(rows, "seq long, ts timestamp")
    out = {
        r.window_start: r
        for r in ev_ops.late_arrival_audit(
            df, arrival_cols=["seq"], allowed_lateness_sec=60, partitions=3
        ).collect()
    }
    h10 = out[int(dt.datetime(2024, 1, 1, 10, 0, 0)
                  .replace(tzinfo=dt.timezone.utc).timestamp())]
    # 10:30 event: out of order AND dropped (hwm 12:00 − 60 s > 11:00)
    assert (h10.n_events, h10.n_out_of_order, h10.n_dropped) == (1, 1, 1)
    assert h10.max_lateness_sec == 90 * 60
    h11 = out[int(dt.datetime(2024, 1, 1, 11, 0, 0)
                  .replace(tzinfo=dt.timezone.utc).timestamp())]
    assert (h11.n_events, h11.n_out_of_order, h11.n_dropped) == (1, 1, 1)
    h12 = out[int(dt.datetime(2024, 1, 1, 12, 0, 0)
                  .replace(tzinfo=dt.timezone.utc).timestamp())]
    assert (h12.n_events, h12.n_out_of_order, h12.n_dropped) == (2, 0, 0)


def test_late_arrival_audit_partition_invariant(spark):
    """The two-phase running max must not depend on the slice count."""
    from data_pipeline_rsna_spark.operators import events as ev_ops

    rows = [
        (i, dt.datetime(2024, 1, 1, 8 + (i * 7) % 5, (i * 13) % 60, 0))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "seq long, ts timestamp")
    a = sorted(
        map(tuple, ev_ops.late_arrival_audit(
            df, ["seq"], partitions=1).collect())
    )
    b = sorted(
        map(tuple, ev_ops.late_arrival_audit(
            df.repartition(7), ["seq"], partitions=6).collect())
    )
    assert a == b
