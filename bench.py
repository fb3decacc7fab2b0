"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is timed as a full
materialization to a noop sink (never driver collect).

Protocol matches BASELINE.md's DuckDB baseline measurement ("warm cache,
median of N"): one untimed warmup run per query — which also pays Spark's
one-time plan codegen, the cost a long-running session amortizes — then
the median of ``BENCH_RUNS`` timed runs. ``BENCH_RUNS=1 BENCH_WARMUP=0``
reproduces single-shot cold timings.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_rsna_spark.queries import REGISTRY  # noqa: E402
from data_pipeline_rsna_spark.session import get_spark  # noqa: E402

# Headline set: the flagship plus the heaviest representatives of each
# operator family. Updated as families land.
HEADLINE = [
    "labels_ingest",
    "three_way_lookup_join",
    "pricing_summary",
    "window_topk_per_group",
    "deterministic_split",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_token_stats",
    "similarity_topk_cosine",
    "events_hourly_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Size shuffle parallelism to the DATA, not the machine: at sf<=0.1 a
    # 32-way shuffle is ~350 KB/task and pure scheduling overhead (measured
    # 2.7x slower on the minhash query than 8-way). This is exactly the
    # decision AQE's coalescer makes after the first exchange — the bench
    # just starts there. At sf>=1 the machine-sized default stands; on a
    # cluster this knob scales with total cores x data, as SCALING.md lays
    # out per query family.
    try:
        if float(sf) <= 0.25:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
    except ValueError:
        pass

    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    runs = int(os.environ.get("BENCH_RUNS", "5"))
    warmup = int(os.environ.get("BENCH_WARMUP", "1"))

    def run_once(spec) -> float:
        t0 = time.time()
        df = spec.spark_fn(spark, sf_dir)
        # force full materialization of every column without driver collect
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        for _ in range(warmup):
            run_once(spec)
        timings[name] = round(
            statistics.median(run_once(spec) for _ in range(runs)), 3
        )
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
