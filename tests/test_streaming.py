"""X6: stream-batch equivalence — the batch query is the semantic oracle."""

from __future__ import annotations

from data_pipeline_rsna_spark import tables
from data_pipeline_rsna_spark.operators import events as ev
from data_pipeline_rsna_spark.streaming import events_stream as es


def _key(rows):
    return sorted(
        (r.window_start, r.event_type, r.n, r.sum_value, r.avg_value)
        for r in rows
    )


def test_stream_equals_batch(spark, sf_dir):
    batch = ev.hourly_type_agg(tables.load(spark, sf_dir, "events"))
    stream = es.run_bounded(
        es.hourly_type_agg_stream(es.read_events_stream(spark, sf_dir))
    )
    assert _key(stream.collect()) == _key(batch.collect())


def test_session_stream_equals_batch(spark, sf_dir):
    batch = es.session_agg_batch(tables.load(spark, sf_dir, "events"))
    stream = es.run_bounded(
        es.session_agg_stream(es.read_events_stream(spark, sf_dir))
    )
    key = lambda rows: sorted(  # noqa: E731
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in rows
    )
    assert key(stream.collect()) == key(batch.collect())


def test_stateful_running_totals_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    events = tables.load(spark, sf_dir, "events")
    batch = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
    )
    got = es.run_bounded(
        es.user_running_totals_stream(es.read_events_stream(spark, sf_dir)),
        mode="update",
    )
    # update mode: keep the LAST row per user (cumulative totals grow)
    final = {}
    for r in got.collect():
        prev = final.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            final[r.user_id] = (r.n_events, round(r.sum_value, 4))
    want = {
        r.user_id: (r.n_events, round(r.sum_value, 4)) for r in batch.collect()
    }
    assert final == want
