"""DuckDB baseline timings for the headline queries (BASELINE.md plan):
runs each headline query's oracle_sql on DuckDB over the same sf parquet,
median of N, printed as one JSON line for comparison against bench.py.

Usage: python tools/bench_baseline.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from data_pipeline_rsna_spark.queries import REGISTRY  # noqa: E402
from data_pipeline_rsna_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        glob = p + "/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None or spec.oracle is None:
            continue
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_headline_median",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": sf_dir,
                "repeats": repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
