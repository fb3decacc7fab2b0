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
    rep.wholestage_codegen_ids = [
        int(m) for m in re.findall(r"\[codegen id : (\d+)\]", text)
    ]
    rep.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    rep.read_schemas = re.findall(r"ReadSchema: ([^\n]*)", text)
    return rep


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
