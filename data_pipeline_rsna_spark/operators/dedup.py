"""Deduplication operators for LLM-scale corpora (SURVEY.md §2.3 X1/X2).

Four methods, ordered by cost:

- **exact**: content-hash groupBy (generalizes the reference's sha256
  record keying, ``images_to_tfrecord.py:96-101``). One shuffle on the
  hash; at 100 TB the hash is 16-32 bytes/row, so the shuffle is tiny
  relative to the data.
- **MinHash + LSH banding**: shingle → H minhashes → b bands of r rows →
  bucket-join. Only documents sharing a band bucket ever meet, so the
  candidate join is output-bound, not O(n²).
- **SimHash**: one 16-bit signature per document; near-dups have small
  Hamming distance. Signature computation is a single explode+groupBy.
- **exact n-gram Jaccard**: inverted-index join on shingles (pairs that
  share at least one shingle), then exact Jaccard from shared/total
  counts — the verifier for the approximate methods, and itself scalable
  because the join is on the shingle inverted index, never a crossJoin.

Portability note: every hash here is ``md5`` of a string and every
"minimum" is the lexicographic min of hex strings. That makes the whole
family bit-reproducible in any engine with md5 — which is what lets the
DuckDB oracle check these queries value-for-value. md5 is uniform enough
for sketching; it is NOT a security choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / shingling (shared with textanalysis)
# ---------------------------------------------------------------------------


def tokens_col(text_col: str = "text") -> F.Column:
    """Whitespace tokens, lowercased."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def shingles_col(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles. Documents shorter than ``n`` tokens
    produce no shingles (callers filter those; the oracle does too)."""
    ws = tokens_col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n)),
        )
    )


def exploded_shingles(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3) -> DataFrame:
    """One row per (doc, distinct shingle). The inverted-index base."""
    return (
        docs.filter(F.size(tokens_col(text_col)) >= n)
        .select(id_col, F.explode(shingles_col(text_col, n)).alias("shingle"))
    )


# ---------------------------------------------------------------------------
# X1 — exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Group identical content by md5; keeper = min id per group.
    Returns (content_hash, n_copies, keeper_id). ``dropDuplicates`` would
    pick an arbitrary survivor; min-id is deterministic."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """The dedup itself: keep one row per distinct content (min-id wins)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# X2 — MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_hashes: int = 12,
                       shingle_n: int = 3) -> DataFrame:
    """(doc, i, minhash_i) for i in 0..H-1: min over shingles of
    md5(i || '|' || shingle). The explode×H blow-up stays inside tasks
    (narrow) until the groupBy, which shuffles (doc, i) pairs — H·|docs|
    rows of ~50 bytes, independent of document length."""
    sh = exploded_shingles(docs, id_col, text_col, shingle_n)
    hashed = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
        "shingle",
    ).select(
        id_col,
        "i",
        F.md5(F.concat_ws("|", F.col("i").cast("string"), F.col("shingle"))).alias("h"),
    )
    return hashed.groupBy(id_col, "i").agg(F.min("h").alias("mh"))


def lsh_band_buckets(signatures: DataFrame, id_col: str = "doc_id",
                     rows_per_band: int = 2) -> DataFrame:
    """Fold (doc, i, mh) into (doc, band, band_hash). Docs agreeing on ALL
    rows of a band share a band_hash → candidate pair."""
    return (
        signatures.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(F.sort_array(F.collect_list(F.struct("i", "mh"))).mh, "|")
            ).alias("band_hash")
        )
    )


def minhash_lsh_candidates(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 12,
                           rows_per_band: int = 2,
                           shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs: (doc_a, doc_b, n_shared_bands), doc_a <
    doc_b. The self-join is on (band, band_hash) — bucket-local, so its
    cost scales with bucket occupancy (≈ true near-dups), not n²."""
    bands = lsh_band_buckets(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n),
        id_col,
        rows_per_band,
    )
    a = bands.select(
        F.col(id_col).alias("doc_a"), "band", "band_hash"
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), "band", "band_hash"
    )
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------------------
# X2b — SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32  # one bit per md5 hex digit (md5 has 32 hex digits)


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            shingle_n: int = 3) -> DataFrame:
    """32-bit SimHash per document over its distinct shingle set.

    Bit j of shingle s = msb of hex digit j of md5(s) (± vote); document
    bit j = sign of the vote sum; signature = Σ bit_j·2^j. Returns
    (id, simhash:long). Shingles, not raw tokens: with a small vocabulary
    every document contains nearly every token, which would collapse all
    token-based signatures onto one value; 3-gram shingle sets stay
    document-specific."""
    sh = exploded_shingles(docs, id_col, text_col, shingle_n).withColumn(
        "h", F.md5("shingle")
    )
    votes = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
        "h",
    ).select(
        id_col,
        "j",
        F.when(F.substring("h", F.col("j") + 1, 1) >= "8", 1)
        .otherwise(-1)
        .alias("vote"),
    )
    bit = (F.sum("vote") > 0).cast("long")
    per_bit = votes.groupBy(id_col, "j").agg(bit.alias("bit"))
    return per_bit.groupBy(id_col).agg(
        F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("j")).cast("long")).alias(
            "simhash"
        )
    )


def simhash_near_pairs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, without a crossJoin.

    Pigeonhole blocking: split the signature into ``max_hamming + 1``
    blocks; any pair within distance ``max_hamming`` must agree exactly
    on at least one block, so joining on (block_index, block_value)
    finds every qualifying pair. Candidates are then verified with the
    exact popcount — blocking affects cost only, never the answer."""
    n_blocks = max_hamming + 1
    block_bits = SIMHASH_BITS // n_blocks
    assert block_bits >= 1, "too many blocks for the signature width"
    sig = simhash(docs, id_col, text_col)
    blocks = sig.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
    ).withColumn(
        # (sig >> blk*bits) & mask, written with arithmetic because
        # shiftright() takes only a literal shift amount
        "blk_val",
        (
            F.col("simhash")
            / F.pow(F.lit(2.0), F.col("blk") * block_bits).cast("long")
        ).cast("long")
        % (1 << block_bits),
    )
    a = blocks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"),
        "blk", "blk_val",
    )
    b = blocks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"),
        "blk", "blk_val",
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["blk", "blk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# X2c — exact n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard similarity on shingle sets for every pair sharing at
    least one shingle. jaccard = shared / (|A| + |B| - shared).

    The join is shingle-keyed (inverted index): a shingle shared by k
    docs contributes k² join rows, so ubiquitous shingles are the skew
    risk — at scale, drop shingles with document frequency above a cap
    (they contribute near-zero Jaccard evidence anyway)."""
    sh = exploded_shingles(docs, id_col, text_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )
