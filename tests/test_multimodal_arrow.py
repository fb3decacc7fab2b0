"""mapInArrow pixel path: zero-copy batches must agree exactly with the
pandas path (same schema, same values) — the template contract for
moving any multimodal kernel off the pandas conversion if its python
cost ever dominates."""

from __future__ import annotations

from data_pipeline_rsna_spark.operators import multimodal as mm


def test_arrow_stats_match_pandas_stats(spark):
    imgs = mm.synth_images(spark, n=40, height=16, width=16)
    a = {r.img_id: (r.sum_px, r.mean_px, r.min_px, r.max_px)
         for r in mm.pixel_stats_arrow(imgs).collect()}
    p = {r.img_id: (r.sum_px, r.mean_px, r.min_px, r.max_px)
         for r in mm.pixel_stats(imgs).collect()}
    assert a == p and len(a) == 40
