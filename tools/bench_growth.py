"""Measure sf0.1 → sf1 wall-clock growth for the heaviest queries.

The headline bench (bench.py) and the full sweep (bench_all.py) hold
the per-SF magnitudes; this tool answers the SCALE question directly:
for the OPSBENCH top rows, how does wall clock grow across a measured
10× data step? Sequential same-JVM runs at both SFs, one warmup + one
timed pass per (query, sf) so the 10× ratio is warm-vs-warm.

Usage: python tools/bench_growth.py [sf_small_dir sf_big_dir] [query ...]
Emits a markdown table (stdout) for SCALING.md plus per-row growth
classification: sublinear (< 10×), ~linear, or output-bound (state the
output growth next to it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_rsna_spark.queries import REGISTRY  # noqa: E402
from data_pipeline_rsna_spark.session import get_spark  # noqa: E402

# OPSBENCH r6 top-10 (slowest-first at sf0.1) — the rows where
# output-bound and state-bound growth lives.
DEFAULT_QUERIES = [
    "rsna_pipeline_counts",
    "dedup_prefix_filter_jaccard",
    "events_attribution_full_outer_streaming",
    "events_attribution_outer_streaming",
    "dedup_tfidf_cosine_pairs",
    "events_attribution_streaming",
    "graph_pagerank_integer",
    "labels_ingest",
    "similarity_knn_graph_stats",
    "augmentation_dag_counts",
]


def main() -> None:
    args = sys.argv[1:]
    if len(args) >= 2 and os.path.isdir(args[0]) and os.path.isdir(args[1]):
        sf_small, sf_big, names = args[0], args[1], args[2:]
    else:
        sf_small, sf_big = "/root/testdata/sf0.1", "/root/repo/.localdata/sf1"
        names = args
    names = names or DEFAULT_QUERIES
    spark = get_spark("bench_growth", shuffle_partitions="32")

    def timed(name: str, sf_dir: str) -> tuple[float, int]:
        spec = REGISTRY[name]
        spec.spark_fn(spark, sf_dir).count()  # warm plan + JIT
        t0 = time.time()
        n = spec.spark_fn(spark, sf_dir).count()
        return time.time() - t0, n

    print(f"load_avg at start: {os.getloadavg()[0]:.1f}", file=sys.stderr)
    print("| query | sf0.1 s | sf1 s | time ×. | rows sf0.1 | rows sf1 | rows × |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        t_s, n_s = timed(name, sf_small)
        t_b, n_b = timed(name, sf_big)
        tr = t_b / t_s if t_s else float("inf")
        rr = n_b / n_s if n_s else float("inf")
        print(
            f"| {name} | {t_s:.2f} | {t_b:.2f} | {tr:.1f}× "
            f"| {n_s} | {n_b} | {rr:.1f}× |",
            flush=True,
        )
    print(f"load_avg at end: {os.getloadavg()[0]:.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
