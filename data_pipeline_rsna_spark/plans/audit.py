"""Physical-plan audit helpers.

The engine's scale contract is declarative: filters reach the scan,
projections prune columns, small dimensions broadcast, hot paths stay
inside whole-stage codegen, and shuffles appear only where an operator
semantically requires one. These helpers turn ``explain()`` output into
assertable facts so tests can pin the contract down — a plan regression
(a lost pushdown, a broadcast that became a sort-merge join, an extra
exchange) fails CI instead of surfacing as a 100 TB incident.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    """Summary of one physical plan."""

    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    n_shuffle_exchanges: int = 0
    n_broadcast_hash_joins: int = 0
    n_sort_merge_joins: int = 0
    n_cartesian_products: int = 0
    n_bnl_joins: int = 0
    wholestage_codegen_ids: list[int] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    text: str = ""

    @property
    def n_codegen_spans(self) -> int:
        return len(set(self.wholestage_codegen_ids))


def plan_report(df: DataFrame) -> PlanReport:
    """Parse the formatted physical plan into a PlanReport."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    rep = PlanReport(text=text)
    # "formatted" mode names nodes as "(N) Exchange" with the partitioning
    # in an Arguments: line, and tags codegen membership "[codegen id : N]"
    rep.n_broadcast_exchanges = len(
        re.findall(r"^\(\d+\) BroadcastExchange", text, re.M)
    )
    rep.n_shuffle_exchanges = len(
        re.findall(r"^\(\d+\) Exchange\b", text, re.M)
    )
    rep.n_exchanges = rep.n_broadcast_exchanges + rep.n_shuffle_exchanges
    rep.n_broadcast_hash_joins = len(
        re.findall(r"^\(\d+\) BroadcastHashJoin", text, re.M)
    )
    rep.n_sort_merge_joins = len(
        re.findall(r"^\(\d+\) SortMergeJoin", text, re.M)
    )
    # quadratic join strategies — the 100 TB cliff edges. A
    # CartesianProduct is |L|×|R| work and shuffle; a
    # BroadcastNestedLoopJoin re-scans the broadcast side per row.
    # Legitimate uses in this engine are broadcast SINGLETONS only
    # (a 1-row aggregate joined to every row), which the planner
    # emits as BNLJ — the registry-wide audit therefore reports
    # these as a column that must stay 0 for non-singleton plans
    # and the singleton uses are whitelisted by name (VERDICT r10 #2).
    rep.n_cartesian_products = len(
        re.findall(r"^\(\d+\) CartesianProduct", text, re.M)
    )
    rep.n_bnl_joins = len(
        re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", text, re.M)
    )
    rep.wholestage_codegen_ids = [
        int(m) for m in re.findall(r"\[codegen id : (\d+)\]", text)
    ]
    rep.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    rep.read_schemas = re.findall(r"ReadSchema: ([^\n]*)", text)
    return rep


def unbounded_nested_loop_joins(df: DataFrame,
                                row_bound: int = 65536) -> list[str]:
    """Return a description of every join in the OPTIMIZED logical plan
    that would execute as a quadratic nested-loop strategy WITHOUT a
    statically row-bounded side — the 100 TB cliff edge the registry
    audit must keep at zero.

    A BroadcastNestedLoopJoin is legitimate exactly when one side's
    ``maxRows`` is statically known and small: a global aggregate
    (maxRows=1 singleton — the engine's scalar-stats joins), a LIMIT,
    or a literal LocalRelation dim. Then the join is |big| × O(bound)
    — linear work with a constant factor. A nested-loop join where
    NEITHER side is bounded is |L|×|R| and melts at scale, no matter
    how it got past the planner. Walks the logical Join nodes (plus
    nested subqueries) via py4j; returns [] when the plan is safe."""
    qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
    bad: list[str] = []

    def max_rows(node) -> int | None:
        opt = node.maxRows()
        return int(opt.get()) if opt.isDefined() else None

    def _side(expr, left_out, right_out) -> str | None:
        # which join side can evaluate this expression: "L"/"R" when
        # ALL its attribute references come from that side's output
        # (Catalyst's canEvaluate), else None (mixed or no refs)
        it = expr.references().iterator()
        side = ""
        while it.hasNext():
            a = it.next()
            if left_out.contains(a):
                s = "L"
            elif right_out.contains(a):
                s = "R"
            else:
                return None
            if side and s != side:
                return None
            side = s
        return side or None

    def has_equi_condition(node) -> bool:
        # ExtractEquiJoinKeys-lite: a Join plans as hash/sort-merge
        # (not nested-loop) when some TOP-LEVEL AND-conjunct is an
        # equality (EqualTo / EqualNullSafe) whose two children each
        # evaluate against OPPOSITE join sides. Both halves matter:
        # a substring test on the condition string accepted
        # "(a = b) OR (c = d)" (no extractable key), and a bare
        # conjunct-class test accepted same-side equalities like
        # "left.a = left.b AND left.c < right.d" in an outer join —
        # both plan nested-loop (r11 review, both verified live).
        cond = node.condition()
        if not cond.isDefined():
            return False
        left_out = node.left().outputSet()
        right_out = node.right().outputSet()
        stack = [cond.get()]
        while stack:
            e = stack.pop()
            cls = e.getClass().getSimpleName()
            if cls in ("EqualTo", "EqualNullSafe"):
                kids = e.children()
                sides = {
                    _side(kids.apply(0), left_out, right_out),
                    _side(kids.apply(1), left_out, right_out),
                }
                if sides == {"L", "R"}:
                    return True
            elif cls == "And":
                kids = e.children()
                for i in range(kids.size()):
                    stack.append(kids.apply(i))
        return False

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Join":
            if not has_equi_condition(node):
                sides = [max_rows(node.left()), max_rows(node.right())]
                if not any(m is not None and m <= row_bound
                           for m in sides):
                    bad.append(
                        f"non-equi join with unbounded sides "
                        f"(maxRows={sides}): "
                        f"{node.simpleStringWithNodeId()}"
                    )
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))
        subs = node.subqueries()
        for i in range(subs.size()):
            walk(subs.apply(i))

    walk(qe.optimizedPlan())
    return bad


def assert_filter_pushed(df: DataFrame, fragment: str) -> PlanReport:
    """Assert some parquet scan carries a pushed filter containing
    ``fragment`` (e.g. 'EqualTo(o_orderstatus,F)')."""
    rep = plan_report(df)
    if not any(fragment in pf for pf in rep.pushed_filters):
        raise AssertionError(
            f"no pushed filter contains {fragment!r}; "
            f"pushed: {rep.pushed_filters}\n{rep.text}"
        )
    return rep


def assert_columns_pruned(df: DataFrame, table_fragment: str,
                          max_cols: int) -> PlanReport:
    """Assert the scan whose ReadSchema mentions ``table_fragment`` reads
    at most ``max_cols`` columns (column pruning reached the reader)."""
    rep = plan_report(df)
    for rs in rep.read_schemas:
        if table_fragment in rs:
            ncols = rs.count(":")
            if ncols > max_cols:
                raise AssertionError(
                    f"scan of {table_fragment} reads {ncols} cols "
                    f"(> {max_cols}): {rs}"
                )
            return rep
    raise AssertionError(
        f"no ReadSchema mentions {table_fragment!r}: {rep.read_schemas}"
    )
