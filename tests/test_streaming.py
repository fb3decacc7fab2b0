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
