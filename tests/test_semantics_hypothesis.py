"""Hypothesis-driven semantics parity: the engine's scalar functions
must match CPython's on arbitrary inputs (SURVEY.md §5.2 golden-cast
strategy, generalized from fixtures to generated inputs).

Each property collects its generated examples into ONE DataFrame per
Hypothesis example, keeping Spark-job count = max_examples.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_rsna_spark.functions import scalars as sc

# int32 domain: box coordinates live here; beyond it Spark's ANSI mode
# (correctly) raises CAST_OVERFLOW where CPython would silently widen
_floats = st.floats(
    allow_nan=False, allow_infinity=False,
    min_value=-2_147_483_000.0, max_value=2_147_483_000.0,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_floats, min_size=1, max_size=64))
def test_int_of_float_matches_cpython(spark, xs):
    df = spark.createDataFrame([(repr(x),) for x in xs], "s string")
    got = [r[0] for r in df.select(sc.int_of_float("s")).collect()]
    want = [int(float(repr(x))) for x in xs]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e6, max_value=1e6),
                min_size=1, max_size=64))
def test_py_round_matches_cpython(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = [r[0] for r in df.select(sc.py_round("x")).collect()]
    want = [float(round(x)) for x in xs]
    assert got == want
