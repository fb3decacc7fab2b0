"""Generate a larger scale factor by key-offset replication of sf0.1.

The driver provides read-only testdata up to sf0.1; the scale story
(SCALING.md) needs at least one *measured* 10x step to show the headline
bench total grows sublinearly (per-job floor amortizes) and the heavy
queries track data size. This tool builds that step locally and
deterministically: each table is replicated ``factor`` times with every
join-key column offset by ``copy * key_range`` so that

- FK integrity holds copy-by-copy (orders.copy_i joins customer.copy_i,
  lineitem.copy_i joins orders/part/supplier.copy_i) — join fan-outs per
  key match the source distribution exactly;
- distinct-key counts scale by ``factor`` (group-bys, dedup and top-k
  see genuinely more groups, not the same groups with more rows);
- value distributions (prices, discounts, text, embeddings, timestamps)
  are preserved verbatim, so per-row compute cost matches the source.

region/nation are geography-bounded dims and are copied unchanged, same
as TPC-H itself. Deterministic: pure SQL over the source parquet, no
randomness. Output lives under the repo (``.localdata/``), never in the
read-only /root/testdata.

Round 11 (VERDICT r10 #3): replicated tables land as a DIRECTORY of
one part file per copy (``{table}.parquet/part-{copy:05d}.parquet``)
instead of one monolithic file. Real ingestion produces many files —
the single-file layout gave sf10 documents a 5-row-group scan floor
that dominated dedup_exact's residual and made the fixture
unrepresentative of any production table. Spark reads the directory
transparently; DuckDB consumers glob ``{table}.parquet/*.parquet``.

Usage: python tools/gen_scaled_sf.py [src_dir] [dst_dir] [factor]
       (defaults: /root/testdata/sf0.1 .localdata/sf1 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table: columns to offset by copy * (1 + max over source)
OFFSET_KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

COPY_UNCHANGED = {"region", "nation"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "sf1",
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")

    import shutil

    for table, keys in OFFSET_KEYS.items():
        src_pq = f"{src}/{table}.parquet"
        dst_pq = f"{dst}/{table}.parquet"
        if table in COPY_UNCHANGED:
            con.execute(
                f"COPY (SELECT * FROM '{src_pq}') TO '{dst_pq}' (FORMAT PARQUET)"
            )
            print(f"{table}: copied unchanged")
            continue
        # key ranges from the source (offset stride = max+1 keeps copies
        # disjoint regardless of source key density)
        strides = {
            k: con.execute(
                f"SELECT 1 + max({k}) FROM '{src_pq}'"
            ).fetchone()[0]
            for k in keys
        }
        # one part file per copy: the realistic many-file layout every
        # real ingestion produces (and the shape Spark's default split
        # sizing is designed around)
        if os.path.isdir(dst_pq):
            shutil.rmtree(dst_pq)
        elif os.path.exists(dst_pq):
            os.remove(dst_pq)
        os.makedirs(dst_pq)
        for copy in range(factor):
            select_cols = []
            for (name, _dtype, *_rest) in con.execute(
                f"DESCRIBE SELECT * FROM '{src_pq}'"
            ).fetchall():
                if name in strides:
                    select_cols.append(
                        f"({name} + {copy} * {strides[name]}) AS {name}"
                    )
                else:
                    select_cols.append(name)
            con.execute(f"""
                COPY (
                  SELECT {', '.join(select_cols)} FROM '{src_pq}'
                ) TO '{dst_pq}/part-{copy:05d}.parquet'
                (FORMAT PARQUET, ROW_GROUP_SIZE 122880)
            """)
        n = con.execute(
            f"SELECT count(*) FROM '{dst_pq}/*.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({factor}x, {factor} part files, "
              f"offset keys: {keys})")


if __name__ == "__main__":
    main()
