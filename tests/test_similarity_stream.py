"""Streaming similarity serving: the per-batch answers must equal the
batch kernel run on the same query sets, and the answer log must be
keyed by micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_rsna_spark import tables
from data_pipeline_rsna_spark.operators import similarity as sim
from data_pipeline_rsna_spark.streaming import similarity_stream as ss
import pytest


@pytest.mark.slow
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


@pytest.mark.slow
def test_streaming_dedup_ingest_matches_batch(spark, sf_dir, tmp_path):
    """The streaming ingest gate must flag exactly what the batch
    incremental matcher flags for the same arrivals (within-batch
    scope per micro-batch, corpus index static)."""
    from data_pipeline_rsna_spark.operators import dedup

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.filter(F.col("doc_id") < 40)
    arrivals = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )  # exact copies of indexed docs -> must all match
    index_bands = dedup.lsh_band_buckets(
        dedup.minhash_signatures(existing, num_hashes=12, shingle_n=3),
        num_hashes=12,
        rows_per_band=2,
    )
    staged = str(tmp_path / "arrivals")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt2")
    arrivals.coalesce(1).write.parquet(staged)

    q = ss.dedup_ingest_stream(
        ss.read_doc_stream(spark, staged), index_bands, out, ckpt
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: r.matched_id for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: r.matched_id
        for r in dedup.incremental_minhash_matches(
            index_bands, arrivals, num_hashes=12, rows_per_band=2
        ).collect()
    }
    assert got == want
    assert len(got) == 10  # every planted copy flagged
