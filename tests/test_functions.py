"""Scalar library, salted aggregation, composed label-map loaders."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_rsna_spark.functions import scalars as sc
from data_pipeline_rsna_spark.operators import relational as rel


def test_strip_suffix_only_trailing(spark):
    df = spark.createDataFrame(
        [("a.dcm",), ("a.dcm.dcm",), ("x.dcmy",)], "s string"
    )
    got = [r[0] for r in df.select(sc.strip_suffix("s")).collect()]
    assert got == ["a", "a.dcm", "x.dcmy"]


def test_int_of_float_truncates_toward_zero(spark):
    df = spark.createDataFrame(
        [("10.9",), ("-10.9",), ("0.5",)], "s string"
    )
    got = [r[0] for r in df.select(sc.int_of_float("s")).collect()]
    assert got == [10, -10, 0]  # CPython int(float(s)) semantics


def test_py_round_is_bankers(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (2.5,)], "x double")
    got = [r[0] for r in df.select(sc.py_round("x")).collect()]
    assert got == [0.0, 2.0, 2.0]  # round-half-even, like CPython round()


def test_seeded_uniform_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = [r[0] for r in df.select(sc.seeded_uniform("id", salt="x")).collect()]
    b = [r[0] for r in df.select(sc.seeded_uniform("id", salt="x")).collect()]
    c = [r[0] for r in df.select(sc.seeded_uniform("id", salt="y")).collect()]
    assert a == b  # replayable
    assert a != c  # salt-sensitive
    assert all(0.0 <= v < 1.0 for v in a)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    from data_pipeline_rsna_spark import tables

    li = tables.load(spark, sf_dir, "lineitem")
    salted = {
        r.l_returnflag: (r.n, round(r.rev, 2))
        for r in rel.salted_aggregate(
            li, ["l_returnflag"],
            {"n": ("l_returnflag", "count"), "rev": ("l_extendedprice", "sum")},
        ).collect()
    }
    plain = {
        r.l_returnflag: (r.n, round(r.rev, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_extendedprice").alias("rev"))
        .collect()
    }
    assert salted == plain


def test_composed_labelmap_loaders(spark, tmp_path):
    from data_pipeline_rsna_spark.sources import readers

    p = tmp_path / "lm.pbtxt"
    p.write_text(
        'item { name: "a" id: 1 display_name: "Alpha" }\n'
        'item { name: "b" id: 2 }\n'
        'item { name: "dup" id: 1 display_name: "Dup" }\n'
    )
    cats = {
        r.id: r.category_name
        for r in readers.create_categories_from_labelmap(spark, str(p)).collect()
    }
    assert cats == {1: "Alpha", 2: "b"}  # keep-first, display_name coalesce
    idx = readers.create_category_index_from_labelmap(spark, str(p))
    assert idx[1] == {"id": 1, "name": "Alpha"}


def test_zorder_layout_prunes_both_dimensions(spark):
    """Chunk a z-sorted layout into 'files' and check min/max skipping:
    a narrow band predicate on EITHER dimension must touch far fewer
    chunks than under a lexicographic layout keyed on the other dim."""
    import random

    from pyspark.sql import functions as F

    from data_pipeline_rsna_spark.functions import scalars as sc

    rng = random.Random(11)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(4096)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.withColumn("z", sc.zorder_key2(F.col("x"), F.col("y"))).collect()

    def chunks_touched(order_key, band_dim):
        srt = sorted(rows, key=order_key)
        chunks = [srt[i : i + 64] for i in range(0, len(srt), 64)]
        lo, hi = 30000, 30000 + 6554  # a 10%-wide band
        return sum(
            1
            for c in chunks
            if max(getattr(r, band_dim) for r in c) >= lo
            and min(getattr(r, band_dim) for r in c) <= hi
        )

    z_x = chunks_touched(lambda r: r.z, "x")
    z_y = chunks_touched(lambda r: r.z, "y")
    # lexicographic on (y, x): x is the trailing dim -> no x pruning
    lex_x = chunks_touched(lambda r: (r.y, r.x), "x")
    assert lex_x > 60  # nearly every chunk touched
    assert z_x < lex_x / 2 and z_y < lex_x / 2
    assert z_x < 30 and z_y < 30
