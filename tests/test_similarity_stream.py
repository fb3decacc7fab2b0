"""Streaming similarity serving: the per-batch answers must equal the
batch kernel run on the same query sets, and the answer log must be
keyed by micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_rsna_spark import tables
from data_pipeline_rsna_spark.operators import similarity as sim
from data_pipeline_rsna_spark.streaming import similarity_stream as ss


def test_streamed_topk_matches_batch_kernel(spark, sf_dir, tmp_path):
    corpus = tables.load(spark, sf_dir, "embeddings")
    staged = str(tmp_path / "query_batches")
    out = str(tmp_path / "answers")
    ckpt = str(tmp_path / "ckpt")

    # two serving micro-batches: one parquet file each
    b0 = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    b1 = corpus.filter(
        (F.col("vec_id") >= 3) & (F.col("vec_id") < 5)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    b0.coalesce(1).write.parquet(staged)
    b1.coalesce(1).write.mode("append").parquet(staged)

    q = ss.serve_topk_stream(
        ss.read_query_stream(spark, staged),
        corpus,
        out_path=out,
        checkpoint=ckpt,
        k=5,
    )
    q.awaitTermination(120)

    log = spark.read.parquet(out)
    assert log.select("_batch").distinct().count() == 2
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in log.collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in sim.cosine_topk(
            corpus, b0.unionByName(b1), k=5
        ).collect()
    }
    assert got == want
