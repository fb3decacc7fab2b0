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

import pytest

# whole-module slow tier: brute-force/hypothesis parity checks
pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------------------
# perceptual-hash / winnowing properties (pure-numpy kernels, no session)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),  # image seed
    st.integers(min_value=1, max_value=40),      # brightness delta
)
def test_dhash_invariant_under_nonsaturating_brightness(seed, delta):
    """dHash compares adjacent pixels, so ANY order-preserving
    transform that saturates nothing leaves every bit unchanged."""
    import numpy as np

    h = w = 16
    px = ((seed * 31 + np.arange(h * w, dtype=np.int64) * 7) % (256 - 40)
          ).astype(np.uint8).reshape(h, w)
    from data_pipeline_rsna_spark.operators.image_kernels import brighten

    def dhash_bits(arr):
        yi = (np.arange(8, dtype=np.int64) * h) // 8
        xi = (np.arange(9, dtype=np.int64) * w) // 9
        s = arr[np.ix_(yi, xi)].astype(np.int64)
        return (s[:, :-1] > s[:, 1:]).ravel().tolist()

    assert dhash_bits(px) == dhash_bits(brighten(px, delta))


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_winnowing_window_density_property(data):
    """Winnowing must select >= 1 hash from EVERY window of w
    consecutive shingles (the density guarantee) — checked directly on
    the kernel math: for any token sequence, each window of w hashes
    contains its own minimum, which is by construction selected."""
    import hashlib

    words = data.draw(
        st.lists(
            st.text(alphabet="abcdefgh", min_size=1, max_size=4),
            min_size=6,
            max_size=40,
        )
    )
    n, w = 3, 4
    hs = [
        hashlib.md5(" ".join(words[i : i + n]).encode()).hexdigest()
        for i in range(len(words) - n + 1)
    ]
    selected = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
    for j in range(len(hs) - w + 1):
        assert selected & set(hs[j : j + w]), (j, words)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="0123456789abcdef", min_size=4, max_size=4),
        min_size=1,
        max_size=24,
        unique=True,
    ),
    st.lists(
        st.text(alphabet="0123456789abcdef", min_size=4, max_size=4),
        min_size=1,
        max_size=24,
    ),
)
def test_ring_successor_matches_bruteforce(spark, point_hashes, target_hashes):
    """ring_successor_join == 'smallest point hash >= target, wrapping
    to the global min' on arbitrary 4-hex ring layouts — including
    collisions between targets and points, empty prefix buckets, and
    all-targets-past-the-max wrap."""
    from data_pipeline_rsna_spark.operators import relational as rel

    points = spark.createDataFrame(
        [(f"p{i}", h) for i, h in enumerate(point_hashes)],
        "pid string, h string",
    )
    targets = spark.createDataFrame(
        [(f"t{i}", h) for i, h in enumerate(target_hashes)],
        "name string, t string",
    )
    got = {
        r["name"]: r["pid_succ"]
        for r in rel.ring_successor_join(
            points, targets, "pid", "h", "t", n_buckets=16
        ).collect()
    }
    by_hash = sorted(zip(point_hashes, range(len(point_hashes))))
    for i, t in enumerate(target_hashes):
        succ = next((f"p{j}" for h, j in by_hash if h >= t), None)
        if succ is None:
            succ = f"p{by_hash[0][1]}"
        assert got[f"t{i}"] == succ, (t, sorted(point_hashes))


def _ks_reference(a: list[int], b: list[int]) -> tuple[int, int, int]:
    """Pure-Python exact KS: (n_a, n_b, ks_num = D*n_a*n_b)."""
    na, nb = len(a), len(b)
    best = 0
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    return na, nb, best


def _w1_reference(a: list[int], b: list[int]) -> int:
    """Pure-Python exact W1 numerator = sum |cumA*nb - cumB*na| * gap."""
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    total = 0
    for v, nxt in zip(vals, vals[1:]):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        total += abs(ca * nb - cb * na) * (nxt - v)
    return total


_cents = st.integers(min_value=-500, max_value=500)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_cents, min_size=1, max_size=40),
    st.lists(_cents, min_size=1, max_size=40),
)
def test_ks_and_wasserstein_match_reference(spark, a, b):
    """The two-phase distributed KS/W1 must agree with a brute-force
    reference on arbitrary integer samples — the property that the
    prefix-sum decomposition, the partition fixups, and the
    cross-multiplied integer form introduce no edge-case drift
    (ties, duplicates, single-element sides, disjoint supports)."""
    from data_pipeline_rsna_spark.operators import stats as stx

    rows = [("a", v / 100.0) for v in a] + [("b", v / 100.0) for v in b]
    df = spark.createDataFrame(rows, "grp string, value double")
    ks = stx.ks_two_sample(df, "grp", "a", "b").collect()[0]
    na, nb, num = _ks_reference(a, b)
    assert (ks.n_a, ks.n_b, ks.ks_num) == (na, nb, num)
    w1 = stx.wasserstein_1d(df, "grp", "a", "b", partitions=3).collect()[0]
    assert (w1.n_a, w1.n_b, w1.w1_num) == (na, nb, _w1_reference(a, b))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("uvw")),
        min_size=1,
        max_size=60,
    )
)
def test_entropy_and_mi_match_reference(spark, pairs):
    """Micro-nat entropy and MI must equal the reference computed with
    the SAME integer-log rounding — the property that every count path
    (singleton categories, one-row groups, full dependence) rounds
    identically."""
    import math

    from data_pipeline_rsna_spark.operators import stats as stx

    L = lambda c: round(math.log(c) * 1e6)  # noqa: E731
    df = spark.createDataFrame(pairs, "a string, b string")

    ent = {
        r.grp: (r.n, r.entropy_micro)
        for r in stx.categorical_entropy(
            df.selectExpr("a AS grp", "b AS cat"), "grp", "cat"
        ).collect()
    }
    from collections import Counter

    by_a = Counter(a for a, _ in pairs)
    for a in by_a:
        cnt = Counter(b for x, b in pairs if x == a)
        n = by_a[a]
        want = L(n) - sum(c * L(c) for c in cnt.values()) // n
        assert ent[a] == (n, want), (a, ent[a], want)

    mi = stx.mutual_information(df, "a", "b").collect()[0]
    n = len(pairs)
    cab = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    want_mi = sum(
        c * (L(c) + L(n) - L(ca[a]) - L(cb[b]))
        for (a, b), c in cab.items()
    )
    assert (mi.n, mi.mi_sum_micro) == (n, want_mi)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(_cents, min_size=1, max_size=40),
    st.lists(_cents, min_size=1, max_size=40),
    st.integers(min_value=2, max_value=8),
)
def test_psi_buckets_match_reference(spark, a, b, nb):
    """PSI terms must equal a reference computed with the same integer
    bucketing, Laplace smoothing, and micro-nat rounding — including
    empty buckets on either side and single-value domains."""
    import math

    from data_pipeline_rsna_spark.operators import stats as stx

    rows = [("a", v / 100.0) for v in a] + [("b", v / 100.0) for v in b]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {
        r.bucket: r
        for r in stx.psi_buckets(df, "grp", "a", "b", n_buckets=nb).collect()
    }
    mn, mx = min(a + b), max(a + b)
    ca = [0] * nb
    cb = [0] * nb
    for v in a:
        ca[min(nb - 1, (v - mn) * nb // (mx - mn + 1))] += 1
    for v in b:
        cb[min(nb - 1, (v - mn) * nb // (mx - mn + 1))] += 1
    na, nbt = sum(ca) + nb, sum(cb) + nb
    assert set(got) == set(range(nb))
    for k in range(nb):
        x = round(
            (math.log(ca[k] + 1) - math.log(na)
             - math.log(cb[k] + 1) + math.log(nbt)) * 1e6
        )
        assert (got[k].ca, got[k].cb) == (ca[k], cb[k])
        assert got[k].x_micro == x, (k, got[k].x_micro, x)
        assert got[k].term_num == ((ca[k] + 1) * nbt - (cb[k] + 1) * na) * x


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10000),
                min_size=2, max_size=50))
def test_gini_identity_matches_reference(spark, cents):
    """The rank-identity Gini (two-phase global ranks over a composite
    key) must equal the classic sorted-form reference on arbitrary
    nonnegative revenue vectors — including ties and zeros."""
    from pyspark.sql import functions as F

    from data_pipeline_rsna_spark.operators import relational as rel

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "l_suppkey long, cents long"
    )
    ranked = rel.global_row_number(
        df.withColumn("_ord", F.expr("cents * 10000000 + l_suppkey")),
        "_ord",
        out_col="rn",
    )
    got = ranked.selectExpr(
        "CAST(count(*) AS BIGINT) AS n",
        "CAST(sum(cents) AS BIGINT) AS sx",
        "CAST(sum(CAST(rn AS BIGINT) * cents) AS BIGINT) AS six",
    ).collect()[0]
    n, sx = len(cents), sum(cents)
    xs = sorted(cents)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    assert (got.n, got.sx, got.six) == (n, sx, six)
    if sx > 0:
        num = 2 * six - (n + 1) * sx
        # mean-difference identity: sum_ij |xi - xj| = 2*(2*six-(n+1)*sx)
        brute = sum(abs(a - b) for a in cents for b in cents)
        assert num * 2 == brute


# ---------------------------------------------------------------------------
# round-5 statistics operators vs brute-force Python references
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("xyz"), st.sampled_from("xyz")),
        min_size=2,
        max_size=60,
    )
)
def test_cohens_kappa_matches_bruteforce(spark, pairs):
    """kappa_num/kappa_den must equal the textbook confusion-matrix
    computation for arbitrary rater pairs (including skewed and
    perfectly-agreeing samples)."""
    from collections import Counter

    from data_pipeline_rsna_spark.operators import stats as stt

    df = spark.createDataFrame(pairs, "a string, b string")
    r = stt.cohens_kappa(df, "a", "b").collect()[0]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    pe_num = sum(ma[c] * mb[c] for c in set(ma) | set(mb))
    assert (r.n, r.agree) == (n, agree)
    assert (int(r.kappa_num), int(r.kappa_den)) == (
        n * agree - pe_num, n * n - pe_num,
    )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50),
             min_size=2, max_size=40)
)
def test_cusum_changepoint_matches_bruteforce(spark, xs):
    """Scaled CUSUM argmax/max must equal the direct O(T^2)-free python
    scan for arbitrary integer series."""
    from data_pipeline_rsna_spark.operators import stats as stt

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, x int"
    )
    r = stt.cusum_changepoint(df, "t", "x").collect()[0]
    t_n, s = len(xs), sum(xs)
    c, best_t, best = 0, None, -1
    for i, x in enumerate(xs):
        c += t_n * x - s
        if abs(c) > best:
            best, best_t = abs(c), i
    assert (r.t_periods, r.s_total) == (t_n, s)
    assert (r.changepoint_at, r.cusum_max_scaled) == (best_t, best)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        min_size=1,
        max_size=50,
    )
)
def test_vocab_coverage_matches_bruteforce(spark, tokens):
    """coverage@k must equal the python sort-by-(freq desc, token)
    prefix sums for arbitrary token multisets at every k."""
    from collections import Counter

    from data_pipeline_rsna_spark.operators import textanalysis as ta

    docs = spark.createDataFrame([(1, " ".join(tokens))],
                                 "doc_id long, text string")
    ks = (1, 3, 10)
    out = {r.k: r for r in ta.vocab_coverage(docs, ks=ks).collect()}
    freq = Counter(tokens)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    for k in ks:
        types = min(k, len(ranked))
        mass = sum(f for _, f in ranked[:k])
        assert (out[k].covered_types, out[k].covered_mass,
                out[k].mass_ppm) == (types, mass,
                                     mass * 1000000 // total), k


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=3, max_size=10),
        min_size=2, max_size=8,
    )
)
def test_prefix_filter_jaccard_matches_bruteforce(spark, corpora):
    """The collapsed/PPJoin-filtered pipeline must emit EXACTLY the
    brute-force qualifying pairs for arbitrary token-set corpora."""
    from fractions import Fraction

    from data_pipeline_rsna_spark.operators import dedup as dd

    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = 0.6
    got = {
        (r.doc_a, r.doc_b): r.overlap
        for r in dd.prefix_filter_jaccard_pairs(docs, threshold=t).collect()
    }
    sets = {i: set(ws) for i, ws in enumerate(corpora)}
    tf = Fraction(6, 10)
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            o = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if o * tf.denominator >= tf.numerator * u:
                want[(a, b)] = o
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=3, max_size=9),
        min_size=2, max_size=6,
    )
)
def test_tfidf_cosine_pairs_matches_bruteforce(spark, corpora):
    """Prefix-filtered tf-idf cosine (unigram terms) must equal the
    brute-force integer-weight rederivation: same pairs, same ppm."""
    import math
    from collections import Counter

    from data_pipeline_rsna_spark.operators import dedup as dd

    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.cosine_ppm
        for r in dd.tfidf_cosine_pairs(
            docs, threshold_num=1, threshold_den=2, shingle_n=None
        ).collect()
    }
    tf = {i: Counter(ws) for i, ws in enumerate(corpora)}
    df = Counter(w for c in tf.values() for w in c)
    n = len(corpora)
    lnn = round(math.log(n) * 1000)
    w = {
        i: {
            t_: c * (lnn - round(math.log(df[t_]) * 1000))
            for t_, c in cnt.items()
            if c * (lnn - round(math.log(df[t_]) * 1000)) > 0
        }
        for i, cnt in tf.items()
    }
    n2 = {i: sum(x * x for x in ws_.values()) for i, ws_ in w.items()}
    want = {}
    for a in w:
        for b in w:
            if a >= b or not n2.get(a) or not n2.get(b):
                continue
            dot = sum(w[a][t_] * w[b][t_] for t_ in w[a] if t_ in w[b])
            if 4 * dot * dot >= 1 * n2[a] * n2[b] and dot > 0:
                want[(a, b)] = math.floor(
                    1_000_000 * dot
                    / (math.sqrt(n2[a]) * math.sqrt(n2[b]))
                )
    assert got == want


def _shingle_set(text: str, n: int = 3) -> set[str]:
    import re

    ws = re.split(r"\s+", text.lower())
    if len(ws) < n:
        return set()
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def _minhash_sig(shingles: set[str], num_hashes: int = 12) -> list[str]:
    """Python twin of minhash_signatures: mh_i = min over shingles of
    an 8-hex-char slice of md5(seed || '|' || shingle), seed = i//4."""
    import hashlib

    digests = {
        s: [
            hashlib.md5(f"{seed}|{s}".encode()).hexdigest()
            for seed in range((num_hashes + 3) // 4)
        ]
        for s in shingles
    }
    return [
        min(digests[s][i // 4][8 * (i % 4):8 * (i % 4) + 8]
            for s in shingles)
        for i in range(num_hashes)
    ]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=3, max_size=10),
        min_size=2, max_size=8,
    )
)
def test_minhash_lsh_candidates_match_bruteforce(spark, corpora):
    """LSH banding must emit EXACTLY the brute-force band-collision
    pairs with exact shared-band counts — the deterministic core the
    probabilistic S-curve recall guarantee stands on. Identical shingle
    sets (Jaccard 1) must always collide on every band."""
    from data_pipeline_rsna_spark.operators import dedup as dd

    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in dd.minhash_lsh_candidates(docs).collect()
    }
    num_hashes, rpb = 12, 2
    sigs = {
        i: _minhash_sig(sh, num_hashes)
        for i, ws in enumerate(corpora)
        if (sh := _shingle_set(" ".join(ws)))
    }
    want = {}
    for a in sigs:
        for b in sigs:
            if a >= b:
                continue
            shared = sum(
                sigs[a][k * rpb:(k + 1) * rpb] == sigs[b][k * rpb:(k + 1) * rpb]
                for k in range(num_hashes // rpb)
            )
            if shared:
                want[(a, b)] = shared
    assert got == want
    # S-curve endpoint: Jaccard-1 pairs collide on ALL bands
    for a in sigs:
        for b in sigs:
            if a < b and _shingle_set(" ".join(corpora[a])) == _shingle_set(
                " ".join(corpora[b])
            ):
                assert want[(a, b)] == num_hashes // rpb


def _simhash_sig(shingles: set[str]) -> int:
    """Python twin of simhash: bit j = sign of Σ votes, vote = +1 when
    hex digit j of md5(shingle) >= '8'."""
    import hashlib

    sig = 0
    for j in range(32):
        vote = sum(
            1 if hashlib.md5(s.encode()).hexdigest()[j] >= "8" else -1
            for s in shingles
        )
        if vote > 0:
            sig |= 1 << j
    return sig


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(_word, min_size=3, max_size=10),
        min_size=2, max_size=8,
    )
)
def test_simhash_near_pairs_match_bruteforce(spark, corpora):
    """Pigeonhole-blocked SimHash pairs must equal brute-force all-pairs
    popcount filtering — blocking is a cost optimization and may never
    change the answer (completeness: distance <= h implies one of the
    h+1 blocks agrees exactly)."""
    from data_pipeline_rsna_spark.operators import dedup as dd

    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dd.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    sigs = {
        i: _simhash_sig(sh)
        for i, ws in enumerate(corpora)
        if (sh := _shingle_set(" ".join(ws)))
    }
    want = {
        (a, b): (sigs[a] ^ sigs[b]).bit_count()
        for a in sigs
        for b in sigs
        if a < b and (sigs[a] ^ sigs[b]).bit_count() <= 3
    }
    assert got == want
