#!/usr/bin/env bash
# Round-close checklist (VERDICT r5 ask #1: regenerate the audit
# artifacts EVERY round so no registered query ships without a recorded
# plan audit). Run from the repo root on an otherwise-quiet box:
#
#   bash tools/round_close.sh
#
# Steps (each writes its artifact; all must succeed):
#   1. pytest               — the unit/property suite stays green
#   2. check_oracle sf0.01  — the full registry vs DuckDB value gate
#                             (the driver's correctness contract)
#   3. plan_audit           — regenerates PLANS.md over ALL registered
#                             queries (shuffle/broadcast/join/pushdown
#                             evidence for SCALING.md's claims)
#   4. bench_all sf0.1      — regenerates OPSBENCH.md (long-tail sweep)
#   5. bench (driver env)   — the graded headline JSON; eyeball total +
#                             floor_s/load_avg before calling it done
#
# COVERAGE.md's registry count lines must then be updated by hand if
# queries were added (grep -c 'register(' data_pipeline_rsna_spark/queries.py).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/5 pytest =="
python -m pytest tests/ -x -q

echo "== 2/5 oracle gate (sf0.01, full registry) =="
python tools/check_oracle.py /root/testdata/sf0.01

echo "== 3/5 plan audit -> PLANS.md =="
python tools/plan_audit.py /root/testdata/sf0.01

echo "== 4/5 opsbench sweep -> OPSBENCH.md =="
python tools/bench_all.py /root/testdata/sf0.1

echo "== 5/5 headline bench (driver invocation) =="
SPARK_GRAFT_CPUS=32 python bench.py

echo "round_close: all artifacts regenerated"
