"""Frequent-itemset mining: market-basket association rules.

The reference pipeline stops at per-record transforms; a training-data
curation engine also needs corpus-level co-occurrence statistics (which
attributes appear together, with what lift) — the same shape as
FP-growth / a-priori output, but expressed as two shuffles of
declarative DataFrame ops instead of an iterative tree algorithm.

Determinism contract: every statistic is an integer (counts) or an
integer-truncated ratio in parts-per-million. ppm values are
``trunc(a * 1e6 / b)`` with all operands exact in IEEE double
(products < 2^53 at every supported SF), so DuckDB reproduces them
bit-for-bit — see queries.py `basket_association_rules`.

Scale shape (100 TB): baskets are built with ONE shuffle on the basket
key (groupBy + collect_set); pair generation is a narrow per-row
combination explode bounded by the item-domain size (not row count);
pair counting is a second shuffle with map-side partial aggregation.
Item supports and the basket total are dimension-sized aggregates that
re-use the basket shuffle's map output (identical exchange → skipped
stages) and join back via broadcast. Nothing is ever O(n²) in baskets:
the candidate space is (items-per-basket choose 2), which a-priori
min-support pruning (``min_support``) caps before the explode when the
item domain is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baskets(items: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """(basket, item) rows → one row per basket with its sorted distinct
    item array. One shuffle on the basket key."""
    return (
        items.select(F.col(basket_col).alias("basket"), F.col(item_col).alias("item"))
        .groupBy("basket")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
    )


def pair_supports(basket_df: DataFrame, min_support: int = 0) -> DataFrame:
    """Unordered item-pair supports: for each basket, explode the sorted
    2-combinations (a < b lexicographically, so each pair counts once),
    then count baskets per pair with map-side combine.

    ``min_support`` drops pairs below the threshold AFTER the count —
    the a-priori optimization (pruning single items first) belongs in
    the caller when the item domain is huge; with a bounded per-basket
    item count the combination explode is already output-bound.
    """
    pairs = basket_df.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("items"),
                            i + 2,
                            F.greatest(F.size(F.col("items")) - i - 1, F.lit(0)),
                        ),
                        lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    counted = pairs.groupBy("item_a", "item_b").agg(
        F.count("*").alias("pair_support")
    )
    if min_support > 0:
        counted = counted.filter(F.col("pair_support") >= min_support)
    return counted


def item_supports(basket_df: DataFrame) -> DataFrame:
    """Per-item basket counts (explode + count; distinct is already
    guaranteed by the basket arrays)."""
    return (
        basket_df.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("item_support"))
    )


def association_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Symmetric association statistics per unordered item pair:

    - ``pair_support``  — baskets containing both items
    - ``support_a/b``   — baskets containing each item
    - ``n_baskets``     — total baskets
    - ``confidence_ab_ppm`` — trunc(pair/|a| * 1e6)  (a → b)
    - ``confidence_ba_ppm`` — trunc(pair/|b| * 1e6)  (b → a)
    - ``lift_ppm``      — trunc(pair·N/(|a|·|b|) * 1e6)

    The two item-support joins broadcast (item domain is
    dimension-sized by construction); the basket total is a 1-row
    broadcast cross join. Integer/ppm outputs keep the result
    hash-comparable across engines.
    """
    # Three consumers (pair counts, item supports, basket total) branch
    # off the basket table; persist so one shuffle+collect_set feeds all
    # three within the query's single action instead of re-deriving the
    # build per branch. (At cluster scale the same persist holds the
    # per-basket arrays — ~rows x avg-basket bytes — in executor memory,
    # spilling to disk if needed; StorageLevel default MEMORY_AND_DISK.)
    b = baskets(items, basket_col, item_col).persist()
    pair = pair_supports(b, min_support=min_support)
    item = item_supports(b)
    total = b.agg(F.count("*").alias("n_baskets"))
    sup_a = item.select(
        F.col("item").alias("item_a"), F.col("item_support").alias("support_a")
    )
    sup_b = item.select(
        F.col("item").alias("item_b"), F.col("item_support").alias("support_b")
    )
    ppm = lambda num, den: F.floor(num * F.lit(1000000.0) / den).cast("bigint")  # noqa: E731
    return (
        pair.join(F.broadcast(sup_a), "item_a")
        .join(F.broadcast(sup_b), "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            "n_baskets",
            ppm(F.col("pair_support"), F.col("support_a")).alias(
                "confidence_ab_ppm"
            ),
            ppm(F.col("pair_support"), F.col("support_b")).alias(
                "confidence_ba_ppm"
            ),
            ppm(
                F.col("pair_support") * F.col("n_baskets"),
                F.col("support_a") * F.col("support_b"),
            ).alias("lift_ppm"),
        )
    )


def cooccurrence_similarity(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = 2,
) -> DataFrame:
    """Item-item collaborative similarity from co-occurrence: for every
    item pair appearing together in ≥ ``min_co`` baskets, the cosine
    over binary basket vectors (co/√(n_a·n_b)) and the lift
    (co·N/(n_a·n_b)) — the classic "customers who bought X also
    bought Y" kernel, and at corpus scale the item-graph edge builder
    recommendation retrieval trains on.

    Exactness: co, n_a, n_b, N are integer counts; lift ships as the
    truncating-division ppm of exact integer products; cosine_ppm is
    the display floor of a float whose inputs are exact integers (both
    engines evaluate the identical expression). Scale shape: the
    basket self-join is bucket-local per basket and fans out
    |basket|²/2 pairs — bounded baskets (a TPC-H order holds ≤ 7
    parts) keep it linear; for unbounded carts, cap or sample baskets
    first (the same mega-bucket guard as MinHash LSH). The ``min_co``
    filter applies AFTER the pair aggregation, which is map-side
    combined on (item_a, item_b).
    """
    b = items.selectExpr(
        f"`{basket_col}` AS _o", f"`{item_col}` AS _p"
    ).distinct()
    left = b.selectExpr("_o", "_p AS item_a")
    right = b.selectExpr("_o", "_p AS item_b")
    pairs = (
        left.join(right, "_o")
        .filter("item_a < item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .filter(f"co >= {min_co}")
    )
    np_ = b.groupBy(F.col("_p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    totals = b.agg(
        F.countDistinct("_o").cast("bigint").alias("_nb")
    )
    return (
        pairs.join(
            F.broadcast(np_.selectExpr("_p AS item_a", "_n AS n_a")),
            "item_a",
        )
        .join(
            F.broadcast(np_.selectExpr("_p AS item_b", "_n AS n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "item_a",
            "item_b",
            "co",
            "n_a",
            "n_b",
            "CAST(floor(1000000 * CAST(co AS DOUBLE) / "
            "(sqrt(CAST(n_a AS DOUBLE)) * sqrt(CAST(n_b AS DOUBLE)))) "
            "AS BIGINT) AS cosine_ppm",
            # decimal(38,0): 1e6·co·N overflows int64 once baskets pass
            # ~10^12 basket-item rows. Integral `div`, not floor(/):
            # Spark decimal division rounds HALF_UP at the result scale
            # before a floor(), diverging from the oracle's truncating
            # integer division within 5e-7 of an integer (r12 fix).
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * co * _nb) div "
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_ppm",
        )
    )
