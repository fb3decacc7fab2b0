"""Incremental batch processing with a file manifest (the batch twin of
the streaming source's offset log).

A 100 TB corpus is not reprocessed per run: each batch run should touch
only input files that arrived since the last run. Structured Streaming
gets this from its checkpoint offset log; the BATCH equivalent here is a
manifest table — one row per processed input file — and an anti-join of
the current file listing against it:

1. list the input's parquet files (a driver-side metadata listing, the
   same cost every scan's planning pays),
2. anti-join against the manifest (file-count rows — metadata-sized),
3. process ONLY the new files (``spark.read.parquet(*new_files)`` keeps
   predicate pushdown/column pruning — the files are ordinary parquet
   inputs),
4. append the results AND the new manifest rows.

Crash contract: results append BEFORE the manifest, so a crash between
the two writes leaves files unrecorded → the next run REPROCESSES them
(at-least-once). Consumers that need exactly-once read the result
through a keyed merge-on-read view (``events_stream.merge_on_read``) or
dedup on a record key — the same discipline every at-least-once log
needs. Recording the manifest first would silently LOSE a crashed
run's data instead, the strictly worse failure.
"""

from __future__ import annotations

import glob
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def list_input_files(input_dir: str) -> list[str]:
    """Stable listing of the data files of a parquet directory."""
    return sorted(
        f
        for f in glob.glob(os.path.join(input_dir, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    )


def processed_files(spark: SparkSession, manifest_dir: str) -> set[str]:
    try:
        return {
            r.file for r in spark.read.parquet(manifest_dir).collect()
        }
    except Exception:  # first run: no manifest yet
        return set()


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    manifest_dir: str,
    transform: Callable[[DataFrame], DataFrame],
) -> list[str]:
    """One incremental run: process input files not yet in the manifest
    through ``transform``, append results, then record the files.
    Returns the list of files processed this run (empty = up to date)."""
    # One manifest read for the whole run: the manifest is file-count
    # rows (metadata-sized), but re-reading it per candidate file would
    # issue O(N) Spark jobs on a large input directory.
    done = processed_files(spark, manifest_dir)
    new = [f for f in list_input_files(input_dir) if f not in done]
    if not new:
        return []
    out = transform(spark.read.parquet(*new))
    out.write.mode("append").parquet(out_dir)
    spark.createDataFrame(
        [(f,) for f in new], "file string"
    ).coalesce(1).write.mode("append").parquet(manifest_dir)
    return new
