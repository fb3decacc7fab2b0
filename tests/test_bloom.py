"""Bloom pre-filter contract: zero false negatives (the correctness
property the prefilter-then-verify pattern rests on), bounded false
positives, and build/probe agreement (both sides evaluate the same
seeded-xxhash64 position expression)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_rsna_spark.functions import bloom
import pytest


def test_no_false_negatives_and_bounded_fpp(spark):
    keys = [str(v * 7919) for v in range(500)]
    kdf = spark.createDataFrame([(x,) for x in keys], "key string")
    m_bits, k = bloom.bloom_params(len(keys), fpp=0.01)
    words = bloom.build_bloom_words(kdf, "key", m_bits, k)

    hits = kdf.filter(
        bloom.bloom_might_contain(F.col("key"), words, m_bits, k)
    ).count()
    assert hits == len(keys)  # a single false negative breaks the pattern

    outside = spark.createDataFrame(
        [(str(10_000_000 + v),) for v in range(2000)], "key string"
    )
    fp = outside.filter(
        bloom.bloom_might_contain(F.col("key"), words, m_bits, k)
    ).count()
    assert fp / 2000 < 0.05, fp  # sized for 1%; 5% bound kills regressions


@pytest.mark.slow
def test_probe_matches_build_positions(spark):
    """Single-key filters: the probe must accept exactly the built key
    (build and probe share the _position expression; this pins that
    the driver-side word fold preserves it)."""
    for key in ["a", "42", "zx|9", ""]:
        m_bits, k = bloom.bloom_params(1, fpp=0.01)
        kdf = spark.createDataFrame([(key,)], "key string")
        words = bloom.build_bloom_words(kdf, "key", m_bits, k)
        assert (
            kdf.filter(
                bloom.bloom_might_contain(F.col("key"), words, m_bits, k)
            ).count()
            == 1
        ), key
