"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares:
  1. row count
  2. column-name set (sorted, as the driver sorts columns before hashing)
  3. the full multiset of values, exactly (floats bit-for-bit after each
     engine's own explicit rounding — queries are required to round).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
        python tools/check_oracle.py [sf_dir] --resume-after NAME

DuckDB runs under a 24 GB memory cap with no temp spill: an oracle
whose plan is super-linear in data (e.g. the deliberately brute-force
O(n^2) spatial argmin) fails with a recorded out-of-memory error at
large SF instead of letting the kernel OOM-kill the whole gate (it
did, at sf1 — 83 GB anon RSS). --resume-after skips every query up to
and including NAME, for restarting a long run after such a failure.
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from data_pipeline_rsna_spark.queries import REGISTRY  # noqa: E402
from data_pipeline_rsna_spark.session import get_spark  # noqa: E402
from data_pipeline_rsna_spark.tables import TABLE_NAMES  # noqa: E402


def _sf_of(sf_dir: str) -> float | None:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return None


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NAN"
        # repr is exact for doubles; -0.0 folds to 0.0
        return repr(v + 0.0)
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, decimal.Decimal):
        # TYPE-TAGGED, deliberately stricter than plain str(): a
        # DECIMAL output column is fetched as python Decimal by some
        # engine versions and as int by others, and a type-sensitive
        # driver hash treats those as different even when the digits
        # match (privacy_t_closeness failed the round-11 driver gate
        # exactly this way while this gate's str() folded them equal).
        # Tagging makes the local gate at least as strict: an
        # oracle-paired query that emits Decimal on one side and int
        # on the other now FAILS here.
        return f"dec:{v}"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    resume_after = None
    if "--resume-after" in args:
        i = args.index("--resume-after")
        resume_after = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    # cap the oracle engine: a super-linear oracle plan at large SF must
    # fail as a recorded error, never OOM-kill the gate process (it did,
    # at sf1: 83 GB anon RSS) — and never grind for hours spilling tens
    # of GB to .tmp either (it did that too: 66 GB of duckdb temp)
    con.execute("SET memory_limit='24GB'")
    # spill off by default (infeasible oracle ⇒ fast error, not an
    # hours-long disk grind); CHECK_ORACLE_SPILL=1 re-enables it for
    # targeted reruns of oracles that legitimately need > 24 GB
    if os.environ.get("CHECK_ORACLE_SPILL") == "1":
        con.execute("SET temp_directory='.tmp'")
    else:
        con.execute("SET temp_directory=''")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet"
            + ("/*.parquet')" if os.path.isdir(f"{sf_dir}/{t}.parquet")
               else "')")
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_run = 0
    skipping = resume_after is not None
    for name, fn in qs.items():
        if skipping:
            if name == resume_after:
                skipping = False
            continue
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        cap = REGISTRY[name].oracle_scale_cap if name in REGISTRY else None
        sf = _sf_of(sf_dir)
        if cap is not None and sf is not None and sf > cap:
            # count(), never collect: capped queries are usually capped
            # BECAUSE their output is data-scaled (tens of millions of
            # pairs) — hauling that to the driver proves nothing extra
            try:
                n_rows = fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
                continue
            print(f"ok   {name}: rows-only ({n_rows} rows) — oracle "
                  f"capped at sf{cap} (super-linear oracle or output; "
                  f"see the query doc) ({time.time()-t0:.1f}s)")
            if n_rows == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.execute(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sc = _canon_rows(scols, [tuple(r) for r in srows])
            dc = _canon_rows(dcols, drows)
            if sc != dc:
                diff_i = next(
                    (i for i, (a, b) in enumerate(zip(sc, dc)) if a != b), None
                )
                detail = ""
                if diff_i is not None:
                    detail = f" first-diff@{diff_i}:\n  spark : {sc[diff_i]}\n  duckdb: {dc[diff_i]}"
                problems.append(f"value-hash mismatch{detail}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    scope = "" if n_run == len(qs) else f" (of {len(qs)} registered)"
    print(f"\n{n_run - len(failures)}/{n_run} queries pass{scope}")
    if only:
        missing = sorted(only - set(qs))
        if missing:
            print(f"WARN unknown query names skipped: {missing}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
