"""Custom Python DataSource (Spark 4 extension point, SURVEY.md §2 O44+).

The reference composes bespoke loaders in driver Python; Spark 4's
DataSource API is the engine-native way to ship one: a source class
registered once becomes a first-class ``spark.read.format(...)`` —
schema declared up front, work split into partitions the scheduler
distributes, rows produced executor-side. This module provides a
deterministic synthetic-events source, which doubles as (a) the API
demonstration and (b) an infinite closed-form test corpus any engine
can re-derive (the DuckDB oracle regenerates it with generate_series).

Performance note: ``read`` yields **Arrow RecordBatches built from
numpy**, not per-row tuples — the per-row path serializes one Python
object per cell and is the same trap as a row-at-a-time UDF; the batch
path moves columnar buffers. Same rule as everywhere in this engine:
Python may orchestrate, buffers stay vectorized.

Closed form (row i): ``user_id = i² mod 97``, ``cents = 37·i mod 10⁴
+ 1`` — integer arithmetic, bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", 10000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = -(-self.n // self.n_parts)  # ceil div
        return [
            _IdRange(lo, min(self.n, lo + step))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange):
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        users = (ids * ids) % 97
        cents = (ids * 37) % 10000 + 1
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids), pa.array(users), pa.array(cents)],
            names=["event_id", "user_id", "cents"],
        )


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id BIGINT, user_id BIGINT, cents BIGINT"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent format registration for the session."""
    spark.dataSource.register(SyntheticEventsSource)
