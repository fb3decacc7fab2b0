"""Capture .explain("formatted") for named queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [query ...]

Writes plans/r12/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set). The suffix is "before"/"after" in the round-12
optimization ledger; the judge reads these files to check plan claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against the code without running Spark.

Round 12 (VERDICT r11 item 9): every capture now records BOTH the
static plan and the AQE-FINAL plan. The session keeps the production
defaults (AQE on), so the static explain shows
``AdaptiveSparkPlan isFinalPlan=false``; the tool then EXECUTES the
query (collect — headline outputs are all small) and re-explains,
appending the ``isFinalPlan=true`` plan in which runtime rewrites
(ReusedExchange, SMJ→SHJ conversion, AQEShuffleRead coalescing) are
visible. Ledger claims about runtime plan shapes must cite the final
section. PLANS_ROUND / CAPTURE_AQE_FINAL env vars override.
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

ROUND = os.environ.get("PLANS_ROUND", "r12")


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(HEADLINE)
    aqe_final = os.environ.get("CAPTURE_AQE_FINAL", "1") == "1"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        ROUND,
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
        static_plan = _explain(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — sf_dir={sf_dir} — explain('formatted')\n")
            fh.write("# --- static plan (pre-execution; AQE on => "
                     "isFinalPlan=false) ---\n")
            fh.write(static_plan)
            if aqe_final:
                spark.sparkContext.setJobDescription(
                    f"capture_plans: {name}"
                )
                df.collect()
                spark.sparkContext.setJobDescription(None)
                fh.write("\n# --- AQE-final plan (post-execution; runtime "
                         "rewrites visible) ---\n")
                fh.write(_explain(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
