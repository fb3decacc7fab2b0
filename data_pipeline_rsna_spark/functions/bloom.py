"""Bloom-filter membership pre-filter: the explicit runtime-filter join.

The scale problem this solves: a semi/anti join of a 100 TB fact table
against a key set too big to trust as a broadcast-hash build (tens of
millions of keys) shuffles the entire fact table just to discard ~99%
of it. A Bloom filter of the key set is hundreds of times smaller than
the keys themselves (~1.2 bytes/key at 1% fpp), ships to every task as
a plain literal/broadcast, and filters at the SCAN, so only probable
matches ever reach the join. Because a Bloom "yes" is only "maybe",
the survivors are verified with the exact join — the final result is
exact; the filter affects cost, never answers.

Spark's optimizer does an automatic version of this
(``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects one into
shuffle joins from the smaller side); this module is the explicit,
testable form, usable on any column expression and any join shape.

Hashing is ``xxhash64(key, seed=i)`` — native, codegen'd, ~ns per
probe — with the BUILD side computed by a Spark job over the key
DataFrame (positions collected to the driver, dimension-sized by
construction), so no Python reimplementation of the hash exists to
drift. An earlier md5+conv() formulation was cross-engine-portable
but 18× slower: each of the k probes embeds its own copy of the hash
Column subtree (Catalyst duplicates shared Column objects; there is
no driver-side CSE through a Filter, and materializing via
withColumn doesn't help — predicate pushdown substitutes the
expression right back), so the md5 ran 2k times per row. With
xxhash64 the duplication costs nanoseconds instead of microseconds.

Sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2). 1M keys at 1% fpp →
~1.2 MB of bits — a literal array of ~150k longs is past expression
limits, so dimension-size key sets feed inline and bigger sets should
wrap the same words in a broadcast variable + pandas UDF; the bit
math is identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits rounded up to a multiple of 64, k hash count)."""
    n = max(n_keys, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    # cap k: the optimum formula explodes for tiny n (m floored at 64),
    # and >16 probes never pays for itself
    k = min(16, max(1, round((m / n) * math.log(2))))
    return m, k


def _position(col: Column, i: int, m_bits: int) -> Column:
    """Bit position of probe ``i``: an independent 64-bit hash per seed,
    folded into [0, m). Build and probe both call THIS function on the
    same stringified key, so agreement is by construction."""
    return F.pmod(F.xxhash64(col.cast("string"), F.lit(i)), F.lit(m_bits))


def build_bloom_words(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> list[int]:
    """Build the bit array with a Spark job over the key DataFrame: set
    positions are computed executor-side (same ``_position`` expression
    the probe uses), deduplicated, and only the DISTINCT positions —
    bounded by m_bits — reach the driver, where they fold into
    ``m_bits/64`` signed longs."""
    pos_rows = (
        keys.select(
            F.explode(
                F.array(
                    *[_position(F.col(key_col), i, m_bits) for i in range(k)]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        pos = int(r["p"])
        words[pos // 64] |= 1 << (pos % 64)
    # two's-complement fold into signed 64-bit for Spark's LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    col: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """JVM-side membership probe: test the k seeded-hash bit positions
    against the literal word array. False → definitely absent (safe to
    drop before any join); True → verify exactly."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    # single-bit masks as a 64-entry literal lookup (shiftleft's shift
    # amount must be a static int in the Column API; a lookup is also
    # one fewer runtime op) — 1<<63 folded to signed long min
    masks = F.array(
        *[
            F.lit((1 << j) - (1 << 64) if j == 63 else (1 << j)).cast("long")
            for j in range(64)
        ]
    )
    cond: Column | None = None
    for i in range(k):
        pos = _position(col, i, m_bits)
        word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
        mask = F.element_at(masks, (pos % F.lit(64)).cast("int") + F.lit(1))
        cond = (
            (word.bitwiseAND(mask) != F.lit(0))
            if cond is None
            else cond & (word.bitwiseAND(mask) != F.lit(0))
        )
    assert cond is not None
    return cond
