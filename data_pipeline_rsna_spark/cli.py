"""Command-line surface of the engine (SURVEY.md §2 O22).

The reference is driven as scripts with argparse flags; the engine's
equivalent is one entry point over the query registry:

    python -m data_pipeline_rsna_spark list [--tag TAG]
    python -m data_pipeline_rsna_spark run QUERY [--sf-dir DIR]
        [--out DIR] [--limit N] [--explain]
    python -m data_pipeline_rsna_spark oracle QUERY [--sf-dir DIR]

``run`` executes a registered query and either shows rows (driver-side,
``--limit``-bounded — never an unbounded collect) or writes parquet to
``--out`` (the scale path: results land as files, nothing crosses the
driver). ``oracle`` prints the query's DuckDB twin for inspection.
Every flag maps onto the same ``queries.REGISTRY`` the differential
gate checks, so the CLI can only run code the oracle has vetted.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="data_pipeline_rsna_spark",
        description="PySpark-native analytics engine: registry-driven CLI",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", help="filter by tag substring")

    rp = sub.add_parser("run", help="run a registered query")
    rp.add_argument("query")
    rp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    rp.add_argument("--out", help="write result parquet here instead of showing")
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan too")

    op = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    op.add_argument("query")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from .queries import REGISTRY

    if args.cmd == "list":
        for name, spec in REGISTRY.items():
            tags = ",".join(spec.tags)
            if args.tag and args.tag not in tags:
                continue
            print(f"{name}\t[{tags}]")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query: {args.query!r} "
              f"({len(REGISTRY)} registered; see `list`)", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        sql = REGISTRY[args.query].oracle
        print(sql if sql else "-- no SQL oracle (rows-only check)")
        return 0

    from .session import get_spark

    spark = get_spark(f"cli:{args.query}")
    df = REGISTRY[args.query].spark_fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.out:
        df.write.mode("error").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via __main__
    raise SystemExit(main())
