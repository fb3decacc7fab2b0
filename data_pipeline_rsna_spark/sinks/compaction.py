"""Small-file compaction — the table-maintenance operator every
long-running ingest needs.

Streaming sinks, incremental batches, and over-parallel writes all leave
directories of kilobyte parquet files; at 100 TB the cost is not disk,
it is PLANNING (every query lists and footers every file) and scan
setup (a task per tiny file). Compaction rewrites a directory into
files near a target size. Two modes, because the rebalance/shuffle
trade is real:

- ``coalesce`` (default): a NARROW repack — Spark glues existing
  partitions together with zero shuffle and zero row movement across
  executors. The right default for the common case (too many small
  files of similar size); output sizes are as even as the inputs are.
- ``repartition``: one round-robin shuffle for exactly even output
  files — worth paying when the inputs are pathologically skewed
  (e.g. one straggler file per micro-batch plus dust).

Sizing is honest: the target file count comes from the actual on-disk
byte total (a driver-side ``os.stat`` over the listing — metadata, the
same cost any scan's planning pays), scaled by a conservative
compression-stability factor of 1 (parquet→parquet rewrites keep
encodings, so bytes-in ≈ bytes-out).

The rewrite is offline-safe, not transactional: output lands in a NEW
directory and the caller swaps it in (rename/pointer flip) — never an
in-place rewrite, which would race readers. A table format
(Iceberg/Delta) makes that swap a metadata commit; the data motion is
identical (see SCALING.md "above ~1 PB").
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def list_data_files(input_dir: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(input_dir, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    )


def plan_compaction(
    input_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int, int]:
    """(n_files, total_bytes, n_output_files) from the directory
    listing alone — the decision is metadata-only, so an orchestrator
    can cheaply skip directories already compact."""
    files = list_data_files(input_dir)
    total = sum(os.stat(f).st_size for f in files)
    n_out = max(1, -(-total // target_bytes))  # ceil div
    return len(files), total, n_out


def compact_parquet_dir(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    mode: str = "coalesce",
) -> DataFrame:
    """Rewrite ``input_dir`` into ≈``target_bytes`` files under
    ``output_dir`` (which must not exist — the caller swaps it in).
    Returns a 1-row manifest DataFrame (files/bytes before, files
    after, mode) for the maintenance log."""
    n_in, total, n_out = plan_compaction(input_dir, target_bytes)
    df = spark.read.parquet(input_dir)
    if mode == "coalesce":
        packed = df.coalesce(n_out)
    elif mode == "repartition":
        packed = df.repartition(n_out)
    else:
        raise ValueError(f"unknown compaction mode: {mode}")
    packed.write.mode("error").parquet(output_dir)
    n_written = len(list_data_files(output_dir))
    return spark.createDataFrame(
        [(n_in, total, n_out, n_written, mode)],
        "files_before int, bytes_before long, files_planned int, "
        "files_after int, mode string",
    )
