"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``data_pipeline_rsna_spark/queries.py``;
this module only adapts it to the driver's function signatures.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_rsna_spark.queries import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's correctness gate checks the first N registered queries in
# order. Front-load every SURVEY.md §2 core-operator query (O1–O44) plus
# one-per-family representatives of the extension surface (X1–X8) so the
# whole reference inventory lands inside the checked window; the
# remaining extension variants follow in registration order and stay
# covered by the local gate (tools/check_oracle.py, all registered).
#
# Round 9 (VERDICT r8 #7): the tail of the window ROTATES. The fixed
# prefix below keeps the O1–O44 core and one anchor per extension
# family; the remaining slots are filled each round with a different
# deterministic slice of the oracle-backed registry (alphabetical,
# offset by _ROTATION_ROUND), so the driver's independent gate
# progressively re-verifies all ~300 queries across rounds instead of
# the same 50 forever. Bump _ROTATION_ROUND by 1 each round.
_ROTATION_ROUND = 12
_DRIVER_WINDOW = 50

_CHECK_WINDOW_PRIORITY = [
    # --- reference core O1–O44 ---
    "labels_ingest",            # O1–O5 ingest→boxes→target
    "deterministic_split",      # O9
    "semi_join_annotations",    # O11
    "anti_join_gaps",           # O43
    "suffix_dispatch",          # O24
    "three_way_lookup_join",    # O26
    "validity_filter",          # O28
    "normalize_coords",         # O29
    "dim_lookup_broadcast",     # O30/O39
    "label_map_checks",         # O38
    "categories_range_dedup",   # O40/O41
    "gap_fill_dense_domain",    # O43
    "augmentation_fanout",      # O19
    "union_stage_outputs",      # O21
    "augmentation_dag_counts",  # O13/O20
    "shard_assignment",         # O33
    "examples_list_tokens",     # O36
    "image_metadata_projection",  # O25
    "json_sink_roundtrip",      # O12/O23
    "scalar_function_kernel",   # O8
    "nested_record_assembly",   # O31
    "rsna_pipeline_counts",     # composed O-pipeline
    "kfold_split_assignment",   # O9 variant
    "box_geometry_transforms",  # O14/O15/O17/O18
    "box_collision_join",       # O16
    "multimodal_pixel_stats",   # O7 / X7
    "multimodal_codec_roundtrip",  # O7 decode + O10 encode, real codecs
    "dedup_exact",              # O27 / X1
    "xml_annotation_scan",      # O37 XML → nested record, parser oracle
    # --- extension family anchors (one per X2–X8 family, always in;
    #     the rest of each family cycles through the rotating slots) ---
    "dedup_minhash_lsh",        # X2
    "similarity_topk_cosine",   # X3
    "text_token_stats",         # X4
    "events_hourly_agg",        # X5
    "events_hourly_streaming",  # X6
    "pricing_summary",          # X8
    # failed the driver's value hash in round 11 (decimal-output /
    # rounding divergence, fixed in round 12): pinned so it STAYS in
    # the checked window until the driver confirms the fix.
    "privacy_t_closeness",
]


def _rotating_names() -> list[str]:
    """The window slots beyond the fixed prefix: a deterministic,
    round-keyed slice of the oracle-backed registry (alphabetical,
    cyclic), so every round the driver independently re-verifies a
    fresh set of extension queries."""
    fixed = set(_CHECK_WINDOW_PRIORITY)
    pool = sorted(
        n for n, spec in REGISTRY.items()
        if n not in fixed and spec.oracle is not None
    )
    k = _DRIVER_WINDOW - len(_CHECK_WINDOW_PRIORITY)
    if k <= 0 or not pool:
        return []
    start = (_ROTATION_ROUND * k) % len(pool)
    return [pool[(start + i) % len(pool)] for i in range(min(k, len(pool)))]


def _ordered_names() -> list[str]:
    head = [n for n in _CHECK_WINDOW_PRIORITY if n in REGISTRY]
    head += _rotating_names()
    rest = [n for n in REGISTRY if n not in set(head)]
    return head + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (labels ingest, SURVEY.md O1-O5) on sf0.001."""
    return REGISTRY["labels_ingest"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].spark_fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
