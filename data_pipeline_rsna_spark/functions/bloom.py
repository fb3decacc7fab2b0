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
testable form with engine-reproducible hashing (md5 double-hashing,
the same portability trick the MinHash/SimHash sketches use), usable
on any column expression and any join shape.

Sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2). 1M keys at 1% fpp →
~1.2 MB of bits — a literal array of ~150k longs is past expression
limits, so `bloom_filter_words` feeds ~dimension-size key sets inline
and bigger sets should wrap the same words in a broadcast variable +
pandas UDF; the bit math is identical.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: fits a signed 64-bit long with headroom, and
# both the Python build side and the Spark conv() probe side read the
# SAME digit spans of the same md5, so positions agree bit-for-bit.
_H1_SPAN = (0, 15)
_H2_SPAN = (16, 31)


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits rounded up to a multiple of 64, k hash count)."""
    n = max(n_keys, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    # cap k: the optimum formula explodes for tiny n (m floored at 64),
    # and >16 probes never pays for itself
    k = min(16, max(1, round((m / n) * math.log(2))))
    return m, k


def _positions(key: str, m_bits: int, k: int) -> list[int]:
    d = hashlib.md5(key.encode()).hexdigest()
    h1 = int(d[_H1_SPAN[0] : _H1_SPAN[1]], 16)
    h2 = int(d[_H2_SPAN[0] : _H2_SPAN[1]], 16)
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_filter_words(keys: list[str], m_bits: int, k: int) -> list[int]:
    """Build the bit array driver-side as ``m_bits/64`` signed longs
    (Kirsch-Mitzenmacher double hashing: k positions from two md5
    halves — the standard trick, k real hashes are unnecessary)."""
    words = [0] * (m_bits // 64)
    for key in keys:
        for pos in _positions(key, m_bits, k):
            words[pos // 64] |= 1 << (pos % 64)
    # two's-complement fold into signed 64-bit for Spark's LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    col: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """JVM-side membership probe: md5 the (stringified) key, derive the
    same k positions via conv() on the same hex spans, test each bit of
    the literal word array. False → definitely absent (safe to drop
    before any join); True → verify exactly."""
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
    d = F.md5(col.cast("string"))
    # reduce both hashes mod m BEFORE the i*h2 product: h2 is a 60-bit
    # value and Spark's ANSI arithmetic would overflow long on i*h2;
    # (h1 + i*h2) mod m == (h1 mod m + i*(h2 mod m)) mod m
    h1 = F.pmod(
        F.conv(F.substring(d, _H1_SPAN[0] + 1, 15), 16, 10).cast("long"),
        F.lit(m_bits),
    )
    h2 = F.pmod(
        F.conv(F.substring(d, _H2_SPAN[0] + 1, 15), 16, 10).cast("long"),
        F.lit(m_bits),
    )
    cond: Column | None = None
    for i in range(k):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
        word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
        mask = F.element_at(masks, (pos % F.lit(64)).cast("int") + F.lit(1))
        cond = (
            (word.bitwiseAND(mask) != F.lit(0))
            if cond is None
            else cond & (word.bitwiseAND(mask) != F.lit(0))
        )
    assert cond is not None
    return cond
