"""Capture .explain("formatted") for named queries into plans/r11/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [query ...]

Writes plans/r11/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set). The suffix is "before"/"after" in the round-11
optimization ledger; the judge reads these files to check plan claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against the code without running Spark.

The session mirrors the bench environment (AQE off at small SF is a
bench-only knob; here we keep the production session defaults so the
captured plan is the one PLANS.md audits), and each plan is captured
from the same REGISTRY spark_fn the driver and bench call.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_pipeline_rsna_spark.queries import (  # noqa: E402
    EXECUTING_QUERIES,
    REGISTRY,
)
from data_pipeline_rsna_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(HEADLINE)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        if name in EXECUTING_QUERIES:
            print(f"skip {name}: executes at plan time", file=sys.stderr)
            continue
        df = spec.spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — sf_dir={sf_dir} — explain('formatted')\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
