"""EWMA integer-units hand-check + partitioning stability; stratified
sampling proportions, determinism, and cross-table consistency."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_rsna_spark.operators import events as ev_ops
from data_pipeline_rsna_spark.operators import relational as rel


@pytest.fixture(scope="module")
def small_events(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.00, "{}"),
        (2, t0 + datetime.timedelta(minutes=1), 7, "a", 2.00, "{}"),
        (3, t0 + datetime.timedelta(minutes=2), 7, "a", 4.00, "{}"),
        (4, t0, 9, "b", 10.00, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_ewma_hand_computed(small_events):
    out = {r.event_id: r.ewma_units
           for r in ev_ops.ewma_units(small_events).collect()}
    s = 2 ** 20
    # event 1: 100 cents * 2^20
    assert out[1] == 100 * s
    # event 2: 200*2^20 + 100*2^19
    assert out[2] == 200 * s + 100 * s // 2
    # event 3: 400*2^20 + 200*2^19 + 100*2^18
    assert out[3] == 400 * s + 200 * s // 2 + 100 * s // 4
    assert out[4] == 1000 * s  # other user unaffected


def test_ewma_lookback_truncates(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, "a", 1.00, "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_id: r.ewma_units for r in ev_ops.ewma_units(df, lookback=3).collect()}
    s = 2 ** 20
    # steady state: 100*(2^20 + 2^19 + 2^18) regardless of history depth
    assert out[29] == 100 * (s + s // 2 + s // 4)
    assert out[0] == 100 * s


def test_ewma_stable_under_repartition(small_events):
    a = sorted(map(tuple, ev_ops.ewma_units(small_events).collect()))
    b = sorted(map(tuple, ev_ops.ewma_units(small_events.repartition(5)).collect()))
    assert a == b


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(k, "hot" if k % 3 == 0 else "cold") for k in range(3000)]
    return spark.createDataFrame(rows, "k long, tier string")


def test_stratified_fractions(strata_df):
    out = rel.stratified_sample(
        strata_df, "tier", "k", {"hot": 500_000, "cold": 100_000}
    )
    by_tier = {r.tier: r["count"] for r in out.groupBy("tier").count().collect()}
    assert abs(by_tier["hot"] / 1000 - 0.5) < 0.08
    assert abs(by_tier["cold"] / 2000 - 0.1) < 0.05


def test_stratified_deterministic_and_subset_stable(strata_df):
    full = {r.k for r in rel.stratified_sample(
        strata_df, "tier", "k", {"hot": 500_000, "cold": 100_000}).collect()}
    again = {r.k for r in rel.stratified_sample(
        strata_df.repartition(11), "tier", "k",
        {"hot": 500_000, "cold": 100_000}).collect()}
    assert full == again
    # sampling a pre-filtered subset keeps exactly the surviving members
    half = strata_df.filter(F.col("k") < 1500)
    sub = {r.k for r in rel.stratified_sample(
        half, "tier", "k", {"hot": 500_000, "cold": 100_000}).collect()}
    assert sub == {k for k in full if k < 1500}


def test_stratified_zero_and_full(strata_df):
    none = rel.stratified_sample(strata_df, "tier", "k", {"hot": 0, "cold": 0})
    assert none.count() == 0
    allr = rel.stratified_sample(
        strata_df, "tier", "k", {"hot": 1_000_000, "cold": 1_000_000}
    )
    assert allr.count() == 3000


def test_uniform_k_sample_exact_size_and_stability(strata_df):
    out = rel.uniform_k_sample(strata_df, "tier", "k", 5)
    sizes = {r.tier: r["count"] for r in out.groupBy("tier").count().collect()}
    assert sizes == {"hot": 5, "cold": 5}
    again = rel.uniform_k_sample(strata_df.repartition(13), "tier", "k", 5)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_uniform_k_sample_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "k long, tier string")
    assert rel.uniform_k_sample(df, "tier", "k", 5).count() == 2
