"""Streaming multimodal ingest (X6 + X7): decode + feature-extract
binary images as they LAND, instead of re-scanning a directory per
batch run.

The shape: a ``binaryFile`` file-source stream (schema declared — file
streams never infer) feeds each micro-batch of raw files through the
SAME decode → pixel-stats operators the batch path uses
(``multimodal.decode_dicom_batch`` / ``pixel_stats``), and
``foreachBatch`` appends the per-image feature rows to a parquet log
keyed by batch id. Stateless per-file work → no watermark, no state
store; exactly-once lands on the batch-id replay contract exactly like
the similarity serving log (similarity_stream.py).

At 100 TB-a-day ingest the source swaps for object-store notifications
and the decode parallelism is the Arrow batch size already tuned in
session.py (256 rows — image-sized payloads); the stream plumbing is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm

BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_binary_stream(spark: SparkSession, path: str, glob: str = "*.dcm",
                       files_per_trigger: int = 1) -> DataFrame:
    """Streaming twin of ``multimodal.read_binary_dir``: one micro-batch
    per ``files_per_trigger`` newly-arrived files, same (path,
    patient_id, content) projection."""
    df = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", files_per_trigger)
        .load(path)
    )
    base = F.regexp_extract(F.col("path"), r"([^/]+)$", 1)
    return df.select(
        "path",
        F.regexp_replace(base, r"\.[^.]*$", "").alias("patient_id"),
        "content",
    )


def ingest_pixel_stats(stream: DataFrame, out_path: str,
                       checkpoint: str) -> "object":
    """Decode each arriving micro-batch and append its per-image pixel
    statistics to the parquet feature log. Returns the StreamingQuery."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            mm.pixel_stats(mm.decode_dicom_batch(batch_df))
            .withColumn("_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
