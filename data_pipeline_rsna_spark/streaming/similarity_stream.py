"""Streaming similarity serving: a query-vector stream answered against
a static corpus, per micro-batch, exactly.

The serving shape of X3: the corpus (embeddings) is the STATIC side —
loaded once, its norms precomputed, reused by every micro-batch — and
each arriving batch of query vectors gets its exact top-k via the same
``cosine_topk`` kernel the batch path uses. ``foreachBatch`` is the
right vehicle (not a streaming aggregation): top-k-per-query is a
bounded per-batch computation with no cross-batch state, so each batch
writes its answers to an append-only parquet log keyed by batch id —
idempotent under Spark's batch-id replay contract.

At scale the static side swaps in the cell-partitioned IVF layout
(`similarity.srp_ivf_topk` over the ``partitionBy("cell")`` corpus, see
tests/test_similarity.py::test_ivf_cell_layout_prunes_at_storage) —
the stream plumbing here is unchanged; only the per-batch kernel call
differs. File-source streams bound ingest via maxFilesPerTrigger the
same way the events replay does (events_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim

QUERY_SCHEMA = "query_id long, embedding array<float>"


def read_query_stream(
    spark: SparkSession, staged_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Bounded file-source stream of query-vector batches (one parquet
    file per trigger = one serving micro-batch)."""
    return (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staged_dir)
    )


def serve_topk_stream(
    queries_stream: DataFrame,
    corpus: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 5,
) -> "object":
    """Answer each micro-batch of queries with exact top-k against the
    static corpus; append (batch_id, query_id, neighbor_id, rank,
    cosine) to the parquet answer log. Returns the StreamingQuery."""

    def answer_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            sim.cosine_topk(corpus, batch_df, k=k)
            .withColumn("_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        queries_stream.writeStream.foreachBatch(answer_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


DOC_SCHEMA = "doc_id long, text string"


def read_doc_stream(
    spark: SparkSession, staged_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Bounded file-source stream of incoming document batches."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staged_dir)
    )


def dedup_ingest_stream(
    docs_stream: DataFrame,
    index_bands: DataFrame,
    out_path: str,
    checkpoint: str,
    num_hashes: int = 12,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> "object":
    """Streaming near-dup ingest gate: each arriving micro-batch of
    documents is checked against the PERSISTED band index (stream-static
    shape — the index is the static side, loaded once) plus its own
    earlier docs, exactly like the batch `incremental_minhash_matches`;
    per-batch collision verdicts append to a parquet log.

    foreachBatch rather than a streaming agg: the minhash signature is
    a groupBy over the batch only (no cross-batch state — cross-batch
    dedup IS the index, which the maintenance job appends each batch's
    bands to). Idempotent under batch-id replay like the other logs."""
    from ..operators import dedup

    def check_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            dedup.incremental_minhash_matches(
                index_bands,
                batch_df,
                num_hashes=num_hashes,
                rows_per_band=rows_per_band,
                shingle_n=shingle_n,
            )
            .withColumn("_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        docs_stream.writeStream.foreachBatch(check_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
