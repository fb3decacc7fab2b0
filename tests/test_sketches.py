"""Sketch accuracy contracts: HLL estimates within the m=256 error band
(with Python-side linear-counting correction for the small-range
regime), CMS point queries as true upper bounds, and mergeability —
the sketch of a union equals the merge of the sketches."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_rsna_spark.operators import mining, sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # 3 groups with known distinct cardinalities 50 / 500 / 2000, each
    # key repeated a deterministic 1-3 times.
    rows = []
    for grp, n in (("a", 50), ("b", 500), ("c", 2000)):
        for k in range(n):
            for rep in range(1 + (k % 3)):
                rows.append((grp, f"{grp}-key-{k}"))
    return spark.createDataFrame(rows, "grp string, key string")


def _corrected(row) -> float:
    """Raw HLL estimate + the standard linear-counting switch, applied
    from the query's exported integer columns (ln is not bit-portable
    across engines, so the engine exports zero_registers instead)."""
    raw = row.est_milli / 1000.0
    m = sketches.HLL_M
    if raw <= 2.5 * m and row.zero_registers > 0:
        return m * math.log(m / row.zero_registers)
    return raw


def test_hll_within_error_band(keyed):
    out = {r.grp: r for r in sketches.hll_distinct(keyed, "grp", "key").collect()}
    for grp, n in (("a", 50), ("b", 500), ("c", 2000)):
        est = _corrected(out[grp])
        # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma.
        assert abs(est - n) / n < 0.20, (grp, est, n)


def test_hll_insensitive_to_repetition(keyed, spark):
    """Distinct counting: duplicating every row must not move a register."""
    doubled = keyed.unionAll(keyed)
    a = sketches.hll_distinct(keyed, "grp", "key").collect()
    b = sketches.hll_distinct(doubled, "grp", "key").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_merge_is_union(keyed):
    """max-merging two register tables == the register table of the
    union (the property that makes per-partition partial agg correct)."""
    half1 = keyed.filter(F.col("key").substr(-1, 1).isin("0", "1", "2", "3", "4"))
    half2 = keyed.subtract(half1)
    merged = (
        sketches.hll_registers(half1, "grp", "key")
        .unionAll(sketches.hll_registers(half2, "grp", "key"))
        .groupBy("grp", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = sketches.hll_registers(keyed, "grp", "key")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_upper_bound_and_tightness(keyed):
    regs = sketches.cms_registers(keyed, "key")
    keys = keyed.select("key").distinct()
    est = {r.key: r.est_count for r in
           sketches.cms_estimate(regs, keys, "key").collect()}
    true = {r.key: r["count"] for r in keyed.groupBy("key").count().collect()}
    n_total = sum(true.values())
    over = 0
    for k, t in true.items():
        assert est[k] >= t, k  # CMS never undercounts
        over += est[k] - t
    # expected overestimate per key ~ n_total / width; allow 5x slack
    assert over / len(true) <= 5 * n_total / sketches.CMS_WIDTH


def test_association_rules_hand_checked(spark):
    items = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "z"), (4, "x")],
        "basket long, item string",
    )
    rules = {
        (r.item_a, r.item_b): r
        for r in mining.association_rules(items, "basket", "item").collect()
    }
    xy = rules[("x", "y")]
    assert (xy.pair_support, xy.support_a, xy.support_b, xy.n_baskets) == (2, 4, 2, 4)
    assert xy.confidence_ab_ppm == 500_000  # 2/4
    assert xy.confidence_ba_ppm == 1_000_000  # 2/2
    assert xy.lift_ppm == 1_000_000  # 2*4/(4*2)
    xz = rules[("x", "z")]
    assert (xz.pair_support, xz.lift_ppm) == (1, 1_000_000)  # 1*4/(4*1)
    assert ("y", "x") not in rules  # unordered, canonical a < b


def test_association_rules_min_support(spark):
    items = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")],
        "basket long, item string",
    )
    rules = mining.association_rules(items, "basket", "item", min_support=2)
    assert [(r.item_a, r.item_b) for r in rules.collect()] == [("x", "y")]


def test_histogram_quantiles_bracket_true_percentiles(spark, sf_dir):
    from data_pipeline_rsna_spark import tables
    from data_pipeline_rsna_spark.operators import sketches as sk
    from pyspark.sql import functions as F

    ev = tables.load(spark, sf_dir, "events")
    hist = sk.value_histogram(ev, "CAST(round(value * 100) AS BIGINT)")
    qs = {r.q: r for r in sk.histogram_quantiles(hist, [50, 90, 99]).collect()}
    cents = sorted(
        r.c for r in ev.select(
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c")
        ).collect()
    )
    n = len(cents)
    for q, row in qs.items():
        true_val = cents[-(-n * q // 100) - 1]  # ceil-rank order statistic
        assert row.lo_cents <= true_val <= row.hi_cents
        assert row.lo_cents == 1 << (row.bucket - 1)
        assert row.hi_cents == (1 << row.bucket) - 1


def test_histogram_sketch_merge_is_vector_add(spark, sf_dir):
    from data_pipeline_rsna_spark import tables
    from data_pipeline_rsna_spark.operators import sketches as sk
    from pyspark.sql import functions as F

    ev = tables.load(spark, sf_dir, "events")
    expr = "CAST(round(value * 100) AS BIGINT)"
    left = ev.filter(F.col("event_id") % 2 == 0)
    right = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        sk.value_histogram(left, expr)
        .unionByName(sk.value_histogram(right, expr))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sk.value_histogram(ev, expr)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # quantiles off the merged sketch == quantiles off the whole sketch
    a = sk.histogram_quantiles(merged, [50, 90, 99]).collect()
    b = sk.histogram_quantiles(whole, [50, 90, 99]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_kmv_sketch_exact_below_k(spark):
    from data_pipeline_rsna_spark.operators import sketches as sk

    df = spark.createDataFrame([(i % 50,) for i in range(500)], "key long")
    s = sk.kmv_sketch(df, "key", k=256)
    # fewer than k distinct values: the sketch IS the distinct hash set
    assert s.count() == 50


def test_kmv_estimates_within_error_bound(spark):
    from data_pipeline_rsna_spark.operators import sketches as sk

    n = 5000
    a = spark.createDataFrame([(i,) for i in range(n)], "key long")
    # b overlaps a on [2500, 5000) and adds [5000, 7500)
    b = spark.createDataFrame([(i,) for i in range(n // 2, n + n // 2)], "key long")
    row = sk.kmv_join_cardinality(a, "key", b, "key", k=256).collect()[0]
    # KMV standard error ~ 1/sqrt(k-1) = 6.3%; assert 4 sigma
    for est, exact in [
        (row.est_distinct_a, n),
        (row.est_distinct_b, n),
        (row.est_distinct_union, n + n // 2),
        (row.est_intersection, n // 2),
    ]:
        assert abs(est - exact) / exact < 0.25, (est, exact)
    assert abs(row.est_jaccard - (n // 2) / (n + n // 2)) < 0.1


def test_cooccurrence_similarity_hand_computed(spark):
    from data_pipeline_rsna_spark.operators import mining

    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"),
        (4, "d"), (1, "a"),  # duplicate line within basket 1 must not count
    ]
    df = spark.createDataFrame(rows, "o long, p string")
    out = {
        (r.item_a, r.item_b): r
        for r in mining.cooccurrence_similarity(df, "o", "p").collect()
    }
    # only (a,b) co-occurs >= 2; n_a=3, n_b=2, N=4
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r.co, r.n_a, r.n_b) == (2, 3, 2)
    import math
    assert r.cosine_ppm == math.floor(
        1_000_000 * 2 / (math.sqrt(3) * math.sqrt(2))
    )
    assert r.lift_ppm == (1_000_000 * 2 * 4) // (3 * 2)
