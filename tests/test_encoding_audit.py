"""Encoding-anomaly audit on PLANTED anomalies: the driver corpus is
clean ASCII, so the oracle gate alone exercises these counters
vacuously — this test feeds actual U+FFFD, control chars, mojibake and
non-ASCII text through BOTH engines' expressions and compares."""

from __future__ import annotations

import duckdb

ROWS = [
    (0, "plain ascii text"),
    (1, "bad � byte �� here"),          # 3 replacement chars
    (2, "ctrl\x01\x02 and \x7f chars\x1f"),            # 4 control chars
    (3, "café naïve 你好"),          # non-ascii, no FFFD
    (4, "mojibake ï¿½ trio"),           # NOT a replacement char
    (5, "tab\tand\nnewline are legal"),                # excluded from n_ctrl
]


def test_planted_anomalies_agree_across_engines(spark):
    from data_pipeline_rsna_spark.queries import REGISTRY

    spec = REGISTRY["text_encoding_anomalies"]
    sdf = spark.createDataFrame(ROWS, "doc_id long, text string")
    sdf.createOrReplaceTempView("documents_planted")
    # run the registered Spark expression over the planted rows by
    # rebuilding it on this DataFrame (the query fn reads parquet, so
    # apply the same operator expressions via the oracle comparison)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}')".replace("\x01", "'||chr(1)||'")
            .replace("\x02", "'||chr(2)||'")
            .replace("\x7f", "'||chr(127)||'")
            .replace("\x1f", "'||chr(31)||'")
            .replace("\t", "'||chr(9)||'")
            .replace("\n", "'||chr(10)||'")
            for i, t in ROWS
        )
        + ") AS t(doc_id, text)"
    )
    want = {
        r[0]: r[1:]
        for r in con.execute(spec.oracle).fetchall()
    }

    from pyspark.sql import functions as F

    t = F.col("text")
    n = F.length(t)

    def count_removed(pattern: str):
        return (n - F.length(F.regexp_replace(t, pattern, ""))).cast("bigint")

    got_df = sdf.select(
        "doc_id",
        n.cast("bigint").alias("n_chars"),
        count_removed(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]").alias("n_ctrl"),
        count_removed("�").alias("n_replacement"),
        F.round(
            count_removed(r"[^\x00-\x7f]") / F.greatest(n, F.lit(1)), 6
        ).alias("non_ascii_ratio"),
    )
    got = {r[0]: tuple(r[1:]) for r in got_df.collect()}
    assert got == want
    # spot-check the semantics themselves, not just agreement
    assert got[1][2] == 3          # three U+FFFD
    assert got[4][2] == 0          # mojibake trio is NOT a replacement char
    assert got[2][1] == 4          # control chars counted
    assert got[5][1] == 0          # \t and \n excluded
