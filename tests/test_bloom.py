"""Bloom pre-filter contract: zero false negatives (the correctness
property the prefilter-then-verify pattern rests on), bounded false
positives, and build/probe hash agreement across the Python/JVM sides."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_rsna_spark.functions import bloom


def test_no_false_negatives_and_bounded_fpp(spark):
    keys = [str(v * 7919) for v in range(500)]
    m_bits, k = bloom.bloom_params(len(keys), fpp=0.01)
    words = bloom.bloom_filter_words(keys, m_bits, k)

    members = spark.createDataFrame([(x,) for x in keys], "key string")
    hits = members.filter(
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


def test_probe_matches_python_positions(spark):
    """The conv()-based JVM probe must read the same md5 spans as the
    Python build side — probe each key's own single-key filter."""
    keys = ["a", "42", "zx|9", ""]
    for key in keys:
        m_bits, k = bloom.bloom_params(1, fpp=0.01)
        words = bloom.bloom_filter_words([key], m_bits, k)
        df = spark.createDataFrame([(key,)], "key string")
        assert (
            df.filter(
                bloom.bloom_might_contain(F.col("key"), words, m_bits, k)
            ).count()
            == 1
        ), key
