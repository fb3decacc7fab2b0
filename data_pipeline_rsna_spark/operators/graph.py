"""Graph analytics over relational edge tables.

PageRank here is deliberately INTEGER arithmetic: every step is bigint
sum / integer division, so the result is bit-identical in any engine —
float PageRank depends on summation order, which no distributed engine
guarantees. Rank unit: 1e6 micro-rank per node at iteration 0;
damping 0.85 applied as ``(850 * x) DIV 1000``.

Reference parity note: the reference repo has no graph operator; this
extends the engine's curation surface (link-graph dedup, domain
authority for corpus weighting) per SURVEY.md §2.3's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import lineage_cut

RANK_UNIT = 1_000_000


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_millis: int = 850,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer micro-rank units.

    ``new_rank(v) = (1000 - damping_millis) * RANK_UNIT DIV 1000
                    + damping_millis * sum(rank(u) DIV deg(u)) DIV 1000``
    over in-neighbors u. Callers must pass a graph where EVERY node has
    at least one out-edge and one in-edge (e.g. a bidirectionalized
    edge list); dangling-node mass redistribution is deliberately out
    of scope for the exact-parity variant.

    Execution: the per-iteration step is join(ranks, edges on src) →
    groupBy(dst) → sum — the Pregel message pattern, two shuffles per
    iteration. Edges are pre-joined with out-degree, repartitioned on
    src ONCE and persisted, so every iteration's join reuses that
    layout and only the (node, rank) table (|V| rows, two columns)
    moves per round. The lineage is cut with localCheckpoint each
    round — without it the plan doubles per iteration and the driver,
    not the data, becomes the bottleneck.
    """
    base = (1000 - damping_millis) * RANK_UNIT // 1000
    deg = edges.groupBy(src).agg(F.count("*").alias("_deg"))
    ed = (
        edges.join(deg, src)
        .repartition(F.col(src))
        .persist()
    )
    # node set from the PERSISTED edge layout, not the raw edges
    # subtree: deriving it from `edges` recomputed the caller's whole
    # edge-construction plan a second time inside iteration 0 (the
    # persist only covers `ed`) — every-node-has-an-out-edge is the
    # documented input contract, so src-distinct over ed is the same
    # set (measured: the duplicated subtree was ~2 s of the sf0.1
    # driver graph's 6.9 s first iteration)
    nodes = ed.select(F.col(src).alias("node")).distinct()
    ranks = nodes.withColumn("rank", F.lit(RANK_UNIT).cast("bigint"))
    for i in range(iterations):
        contribs = ed.join(
            ranks.withColumnRenamed("node", src), src
        ).select(
            F.col(dst).alias("node"),
            F.expr("rank DIV _deg").alias("_c"),
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(base)
                + F.expr(f"{damping_millis} * sum(_c) DIV 1000")
            ).alias("rank")
        )
        # final round EAGER so the unpersist below is safe under ANY
        # config: with lazy cuts on a non-AQE cluster, unpersisting
        # before the first action would recompute the edge subtree
        # once per iteration (AQE only happens to materialize lazy
        # localCheckpoints at build time; don't rely on it)
        ranks = ranks.transform(
            lineage_cut, eager=(i == iterations - 1)
        )
    ed.unpersist()
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected simple
    graph given as canonical edges (src < dst, no duplicates).

    Enumeration is the standard ordered two-join: (a<b) ⋈ (b<c) ⋈
    check (a<c) — each triangle is produced exactly once in a<b<c
    orientation, then exploded to its three corners for the per-node
    rollup.

    Scale shape: the join fan-out is Σ deg(v)² on the ORDERED graph; at
    100 TB edge lists the standard mitigation is degree orientation
    (orient each edge toward the higher-degree endpoint before joining,
    which bounds wedge counts by arboricity) — same join tree, one
    extra degree computation; noted rather than implemented because the
    canonical-order variant is the oracle-checkable one.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance (0..max_hops) from the
    source set to every reachable node, as (node, hop). Frontier-style
    Pregel loop: each round expands the PREVIOUS frontier only and
    anti-joins the visited set, so per-round shuffle volume is the
    frontier × degree, not |V|² — the standard level-synchronous BFS.
    First discovery is minimum distance because expansion is strictly
    level-by-level.

    Same engineering as ``pagerank_integer``: the edge list is
    repartitioned on ``src`` once and persisted so every round's join
    reuses the layout; the visited table is localCheckpoint-ed per
    round to stop the plan doubling. The per-round emptiness check is
    a driver count on the FRONTIER (bounded by |V|) — metadata-scale,
    the loop's only action. At 100 TB-scale graphs the win over the
    unrolled-join formulation is exactly the anti-join pruning: without
    it round k rescans every path of length k.
    """
    ed = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    ed = ed.repartition(F.col("_s")).persist()
    visited = (
        sources.select(F.col("node")).distinct()
        .withColumn("hop", F.lit(0))
        .transform(lineage_cut, eager=True)
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nbrs = (
            frontier.join(ed, frontier.node == ed._s)
            .select(F.col("_d").alias("node"))
            .distinct()
        )
        new = (
            nbrs.join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .transform(lineage_cut, eager=True)
        )
        if new.rdd.isEmpty():
            break
        visited = visited.unionByName(new).transform(lineage_cut, eager=True)
        frontier = new.select("node")
    # every round's cut is EAGER, so nothing downstream re-reads ed —
    # release it instead of leaking one cached edge layout per call
    # into a long-lived session (OPSBENCH runs 305 queries in one JVM)
    ed.unpersist()
    return visited


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node over canonical undirected
    edges (src < dst): cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), the
    how-clique-like-is-this-neighborhood score that separates hub
    nodes (low cc — bridges) from community cores (high cc) — the
    standard community-structure diagnostic next to triangle counts.

    Exact export: ``cc_ppm = 2·T·1e6 DIV (deg·(deg−1))`` — triangle
    counts and degrees are integers, the quotient is a non-negative
    floor division (identical both engines); deg < 2 nodes define
    cc = 0. Degrees are one union+groupBy over the edge list; the
    triangle join is the documented ``triangle_counts`` shape (degree
    orientation is the 100 TB mitigation).
    """
    tri = triangle_counts(edges)
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
        .selectExpr(
            "node",
            "deg",
            "n_triangles",
            "CASE WHEN deg >= 2 THEN "
            "CAST(n_triangles * 2000000 DIV (deg * (deg - 1)) AS BIGINT) "
            "ELSE 0 END AS cc_ppm",
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of an undirected graph (edges as src<dst
    pairs): the Pearson correlation between the degrees at the two ends
    of every edge — positive means hubs link to hubs (social-network
    shape), negative means hubs link to leaves (hub-and-spoke / star
    shape). The single number that says which topology a co-occurrence
    graph grew into, and therefore which skew strategy its downstream
    joins need.

    Exactness: degrees are integers, so r = corr_num /
    sqrt(var_x·var_y) ships as unevaluated decimal(38,0) sufficient
    statistics (the engine-wide rational-export discipline). Each
    undirected edge contributes BOTH orientations, the standard
    Newman convention; by that symmetry var_x = var_y, and both are
    still exported so the oracle twin stays a plain Pearson.

    Shape: one union+groupBy for degrees (map-side combined), two
    joins of the edge list against the (node, degree) table — at
    100 TB the hot side is the power-law hub's degree row, a
    broadcast-sized table per join probe — then a one-row exact
    aggregate. Nothing materializes beyond the edge list itself.
    """
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    du = deg.select(
        F.col("node").alias("_u"), F.col("deg").alias("deg_u")
    )
    dv = deg.select(
        F.col("node").alias("_v"), F.col("deg").alias("deg_v")
    )
    pairs = (
        edges.join(du, edges.src == du._u)
        .join(dv, edges.dst == dv._v)
        .select("deg_u", "deg_v")
    )
    # both orientations: n = 2E; symmetric sums fold to doubled terms
    return pairs.agg(
        (F.count("*") * 2).cast("bigint").alias("n_ends"),
        F.sum(F.col("deg_u") + F.col("deg_v"))
        .cast("decimal(38,0)")
        .alias("_s"),
        F.sum(F.col("deg_u") * F.col("deg_v"))
        .cast("decimal(38,0)")
        .alias("_sxy"),
        F.sum(
            F.col("deg_u") * F.col("deg_u")
            + F.col("deg_v") * F.col("deg_v")
        )
        .cast("decimal(38,0)")
        .alias("_sxx"),
    ).selectExpr(
        "n_ends",
        # decimal(38,0) arithmetic, BIGINT output: the sums are degree-
        # bound (~3e6 at sf0.1, ~E·d̄² growth); an integral output
        # crosses the engine/driver boundary as a plain int, where
        # DECIMAL(38,0) fetches as python Decimal in some DuckDB
        # versions and int in others (r12 fix)
        "CAST(n_ends * (2 * _sxy) - _s * _s AS BIGINT) AS corr_num",
        "CAST(n_ends * _sxx - _s * _s AS BIGINT) AS var_x",
        "CAST(n_ends * _sxx - _s * _s AS BIGINT) AS var_y",
    )


def kcore_vertices(
    edges: DataFrame,
    k: int,
    iterations: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Vertices of the k-core — the maximal subgraph where every vertex
    has degree >= k — by synchronous peeling: each round recomputes
    degrees WITHIN the current survivor set and drops vertices under k;
    the fixpoint is the k-core (Seidman 1983; the peel is confluent, so
    synchronous rounds and sequential peeling converge to the same set).

    ``edges`` must be undirected-symmetrized (both directions present).
    Rounds run until the survivor count stops changing (the set shrinks
    monotonically, so equal counts mean equal sets — the exact
    fixpoint), capped at ``iterations``. Past the fixpoint every round
    is the identity, so a DuckDB twin that unrolls a fixed round count
    >= the convergence depth replays the identical answer. Returns
    (vertex, core_degree).

    Scale notes: each round is edges SEMI-JOIN survivors (on dst)
    SEMI-JOIN survivors (on src) → groupBy(src) count — membership
    tests, so AQE broadcasts the survivor side as soon as it shrinks
    under the threshold; the shuffles partition on vertex id, and the
    survivor list SHRINKS monotonically, so later rounds get cheaper.
    Each round ends in an eager ``localCheckpoint``: iterative lineage
    otherwise grows by two joins per round and Catalyst re-analyzes the
    whole unrolled DAG at materialization (measured: the 12-round lazy
    plan took minutes in the optimizer; checkpointed rounds run the
    same data in seconds). On a cluster use ``checkpoint`` with an HDFS
    dir for the same truncation with fault tolerance. AQE re-sizes the
    shrinking shuffles automatically.
    """
    surv = (
        edges.select(F.col(src).alias("v"))
        .union(edges.select(F.col(dst).alias("v")))
        .distinct()
        .transform(lineage_cut)
    )
    # The edge list is reused every round — checkpoint it once so each
    # round's scan starts from materialized blocks, not the upstream
    # plan (on a cluster: .persist() + a real checkpoint dir).
    ed = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).transform(lineage_cut)
    n_prev = surv.count()
    deg = None
    for _ in range(iterations):
        deg = (
            ed.join(surv.withColumnRenamed("v", "_d"), "_d", "left_semi")
            .join(surv.withColumnRenamed("v", "_s"), "_s", "left_semi")
            .groupBy("_s")
            .agg(F.count("*").alias("core_degree"))
            .where(F.col("core_degree") >= k)
            .transform(lineage_cut)
        )
        surv = deg.select(F.col("_s").alias("v"))
        # Monotone early stop: the survivor set only ever SHRINKS, so an
        # unchanged COUNT implies an unchanged SET — the fixpoint. The
        # count is free (deg is just materialized by the checkpoint) and
        # stopping at the fixpoint is exact, not approximate: every
        # further round is the identity, which is also why the oracle's
        # fixed unroll of `iterations` rounds replays the same answer.
        n_now = deg.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return deg.select(F.col("_s").alias("vertex"), "core_degree")


def jaccard_link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
) -> DataFrame:
    """Neighbor-set Jaccard link prediction: for node pairs NOT joined
    by an edge but sharing ≥ ``min_common`` neighbors, the Jaccard of
    their neighbor sets |N(u)∩N(v)| / |N(u)∪N(v)| — the classic
    "edges most likely to appear next" score (Liben-Nowell & Kleinberg
    2003) behind related-item backfill and graph densification.

    Exact integer rational: common-neighbor counts, degrees, and
    1e6·common DIV (deg_u + deg_v − common) truncate identically in
    both engines. Scale shape: candidate pairs generate through the
    wedge join (edges ⋈ edges on the shared endpoint), so cost is
    Σ_w deg(w)² — run it on a STRONG-TIE graph (prune edges below a
    weight floor first, as the registered query does with co ≥ 2
    baskets) or cap hub degrees the same way MinHash caps mega-buckets;
    the quadratic wedge fan-out is inherent to the definition, not to
    this plan. Existing edges leave via a broadcast-free anti-join on
    the canonical pair.
    """
    und = (
        edges.selectExpr(f"`{src}` AS _u", f"`{dst}` AS _v")
        .union(edges.selectExpr(f"`{dst}` AS _u", f"`{src}` AS _v"))
        .distinct()
        # four consumers (degrees, both wedge sides, the anti-join);
        # without truncating lineage each re-derives the upstream edge
        # construction — 42 static exchanges collapse to the real ~6
        .transform(lineage_cut, eager=True)
    )
    deg = und.groupBy("_u").agg(
        F.count(F.lit(1)).cast("bigint").alias("_deg")
    )
    left = und.selectExpr("_u AS node_a", "_v AS _w")
    right = und.selectExpr("_u AS _w2", "_v AS node_b")
    wedges = (
        left.join(right, F.col("_w") == F.col("_w2"))
        .filter("node_a < node_b")
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_neighbors"))
        .filter(f"common_neighbors >= {min_common}")
    )
    existing = und.filter("_u < _v").selectExpr(
        "_u AS node_a", "_v AS node_b"
    )
    return (
        wedges.join(existing, ["node_a", "node_b"], "left_anti")
        .join(
            deg.selectExpr("_u AS node_a", "_deg AS deg_a"), "node_a"
        )
        .join(
            deg.selectExpr("_u AS node_b", "_deg AS deg_b"), "node_b"
        )
        .selectExpr(
            "node_a",
            "node_b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            "CAST((1000000 * common_neighbors) DIV "
            "(deg_a + deg_b - common_neighbors) AS BIGINT) AS jaccard_ppm",
        )
    )


def hits_scores(
    pairs: DataFrame,
    hub_col: str = "c",
    auth_col: str = "s",
    iters: int = 2,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a bipartite edge
    table, in exact integer micro-score fixed point: authority(s) =
    Σ hub(c) over in-edges, hub(c) = Σ authority(s) over out-edges,
    each vector rescaled to max = 1e6 by integer division per
    iteration — bigint sums and truncating division only, so the
    iterative result is bit-identical across engines and partitionings
    (float HITS depends on summation order). The curator's view of a
    two-sided market: which buyers span the catalog (hubs) and which
    suppliers anchor it (authorities).

    Each iteration is two map-side-combined aggregate-joins on the
    edge table plus a broadcast 1-row max; ``iters`` is small and
    fixed (HITS converges geometrically; rank order stabilizes in a
    handful of rounds). Returns (role, node, score_micro).
    """
    edges = pairs.selectExpr(
        f"`{hub_col}` AS _c", f"`{auth_col}` AS _s"
    ).distinct().transform(lineage_cut, eager=True)
    hubs = edges.select("_c").distinct().selectExpr(
        "_c AS node", "CAST(1000000 AS BIGINT) AS score"
    )

    def _normalize(df: DataFrame) -> DataFrame:
        mx = df.agg(F.max("raw").alias("_mx"))
        return df.crossJoin(F.broadcast(mx)).selectExpr(
            "node", "CAST((raw * 1000000) DIV _mx AS BIGINT) AS score"
        )

    auth = None
    for _ in range(iters):
        # per-round lineage cut, the pagerank lesson: without it the
        # static plan doubles per iteration (measured: 134 exchanges /
        # 44 redundant SMJs in the 2-iteration plan audit vs ~10 real)
        auth = _normalize(
            edges.join(hubs.selectExpr("node AS _c", "score"), "_c")
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("score").cast("bigint").alias("raw"))
        ).transform(lineage_cut, eager=False)
        hubs = _normalize(
            edges.join(auth.selectExpr("node AS _s", "score"), "_s")
            .groupBy(F.col("_c").alias("node"))
            .agg(F.sum("score").cast("bigint").alias("raw"))
        ).transform(lineage_cut, eager=False)
    return hubs.selectExpr(
        "'hub' AS role", "node", "score AS score_micro"
    ).unionByName(
        auth.selectExpr("'authority' AS role", "node", "score AS score_micro")
    )
