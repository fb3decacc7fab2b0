"""Grid radius join: brute-force equivalence (including exact-boundary
and cross-cell pairs) and no-duplicate-emission."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_rsna_spark.operators import spatial


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (1, 0, 0),
        (2, 30, 40),        # dist 50 from p1
        (3, 100, 0),        # dist exactly 100 from p1 (boundary included)
        (4, 101, 0),        # dist 101 from p1 (excluded), 1 from p3
        (5, 199, 199),      # far corner of cell (1,1) from p1's cell (0,0)
        (6, 205, 205),      # adjacent-cell neighbor of p5 (cells differ by 1)
        (7, 5000, 5000),    # isolated
        (8, 0, 100),        # boundary pair with p1 in y
    ]
    return spark.createDataFrame(rows, "id long, x long, y long")


def _brute(df, radius):
    a = df.select(F.col("id").alias("id_a"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = df.select(F.col("id").alias("id_b"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    d = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d.cast("long").alias("dist_sq"))
        .filter(F.col("dist_sq") <= radius * radius)
    )


def test_grid_equals_brute_force(pts):
    got = sorted(map(tuple, spatial.radius_join(pts, 100).collect()))
    want = sorted(map(tuple, _brute(pts, 100).collect()))
    assert got == want
    assert (1, 3, 10000) in got  # exact-boundary pair kept
    assert (5, 6, 72) in got     # pair straddling a cell boundary
    assert not any({a, b} == {1, 4} for a, b, _ in got)


def test_no_duplicate_pairs(pts):
    out = spatial.radius_join(pts, 100).collect()
    keys = [(r.id_a, r.id_b) for r in out]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_synth_points_deterministic(spark):
    df = spark.range(1, 50).withColumnRenamed("id", "k")
    p1 = sorted(map(tuple, spatial.synth_points(df, "k").collect()))
    p2 = sorted(map(tuple, spatial.synth_points(df.repartition(7), "k").collect()))
    assert p1 == p2
    assert all(0 <= x < 100_000 and 0 <= y < 100_000 for _, x, y in p1)


# -- exact nearest neighbor ------------------------------------------------


def _nn_brute(df):
    a = df.select(F.col("id").alias("id_a"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = df.select(F.col("id").alias("id_b"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    d = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .select("id_a", d.cast("long").alias("dist_sq"), "id_b")
        .groupBy("id_a")
        .agg(F.min(F.struct("dist_sq", "id_b")).alias("best"))
        .select(
            F.col("id_a").alias("id"),
            F.col("best.id_b").alias("nn_id"),
            F.col("best.dist_sq").alias("dist_sq"),
        )
    )


def test_nearest_neighbor_matches_brute_force(pts):
    got = sorted(map(tuple, spatial.nearest_neighbor(pts, 100).collect()))
    want = sorted(map(tuple, _nn_brute(pts).collect()))
    assert got == want


def test_nearest_neighbor_fallback_only_sparse(spark):
    # every point isolated far beyond the cell bound: the grid tier
    # certifies NOTHING, the brute-force tier must answer all of them
    rows = [(1, 0, 0), (2, 1000, 0), (3, 0, 2500), (4, 9000, 9000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {(r.id, r.nn_id, r.dist_sq) for r in spatial.nearest_neighbor(df, 10).collect()}
    want = {(r.id, r.nn_id, r.dist_sq) for r in _nn_brute(df).collect()}
    assert got == want
    assert len(got) == 4


def test_nearest_neighbor_tie_breaks_to_smaller_id(spark):
    # ids 2 and 3 are equidistant from 1 -> must pick 2
    rows = [(1, 0, 0), (2, 10, 0), (3, 0, 10)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id: r.nn_id for r in spatial.nearest_neighbor(df, 50).collect()}
    assert got[1] == 2


def test_auto_cell_matches_brute_force_and_tracks_density(spark):
    """cell=None derives the grid from count + bounding box and must
    return the exact NN set; denser inputs must get smaller cells."""
    rows_small = [(i, (i * 37) % 500, (i * 91) % 500) for i in range(40)]
    pts_small = spark.createDataFrame(rows_small, "id long, x long, y long")
    auto = spatial.nearest_neighbor(pts_small).collect()
    exact = spatial.nearest_neighbor(pts_small, cell=10_000).collect()
    key = lambda r: (r.id, r.nn_id, r.dist_sq)  # noqa: E731
    assert sorted(map(key, auto)) == sorted(map(key, exact))
    c_small = spatial.auto_cell(pts_small)
    rows_dense = [
        (i, (i * 37) % 500, (i * 91) % 500) for i in range(4000)
    ]
    pts_dense = spark.createDataFrame(rows_dense, "id long, x long, y long")
    c_dense = spatial.auto_cell(pts_dense)
    assert 1 <= c_dense < c_small
