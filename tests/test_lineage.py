"""lineage_cut: the one switch between local-fast and cluster-safe
lineage truncation (SCALING.md "Lineage cuts on a real cluster")."""

from __future__ import annotations

import os

from data_pipeline_rsna_spark.lineage import lineage_cut


def _scala_none(sc):
    return getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_lineage_cut_uses_local_checkpoint_without_dir(spark):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    df = lineage_cut(spark.range(10).selectExpr("id", "id * 2 AS y"))
    # lineage truncated: the plan is a scan of the checkpointed RDD,
    # not the original range+project
    assert "LogicalRDD" in _plan(df)
    assert df.count() == 10


def test_lineage_cut_uses_reliable_checkpoint_with_dir(spark, tmp_path):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # shared session precondition
    ckpt = tmp_path / "ckpt"
    sc.setCheckpointDir(str(ckpt))
    try:
        df = lineage_cut(spark.range(10))
        assert "LogicalRDD" in _plan(df)
        # reliable checkpoint writes blocks to the configured FS dir —
        # the property that survives executor loss on a cluster
        written = [
            os.path.join(r, f)
            for r, _, fs in os.walk(ckpt)
            for f in fs
        ]
        assert written, "no checkpoint files written to the cluster dir"
        assert df.count() == 10
    finally:
        # restore the shared session's local-mode default (the scala
        # field is a plain var: checkpointDir_$eq(None))
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(_scala_none(sc))
        assert sc.getCheckpointDir() is None


def test_lineage_cut_lazy_mode_defers(spark):
    df = lineage_cut(spark.range(5), eager=False)
    assert df.count() == 5
    assert "LogicalRDD" in _plan(df)


def test_iterative_operator_identical_under_both_checkpoint_modes(
    spark, tmp_path
):
    """VERDICT r7 #6: an iterative operator routed through lineage_cut
    must produce IDENTICAL results with and without a configured
    checkpoint dir (localCheckpoint vs reliable checkpoint), and the
    reliable mode must actually write blocks to the cluster dir."""
    from data_pipeline_rsna_spark.operators import graph

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    # ring + chords: every node has in- and out-edges (the operator's
    # documented precondition)
    n = 40
    rows = [(i, (i + 1) % n) for i in range(n)] + [
        (i, (i + 7) % n) for i in range(n)
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    local_mode = sorted(
        map(tuple, graph.pagerank_integer(edges, iterations=3).collect())
    )
    ckpt = tmp_path / "ckpt_iter"
    sc.setCheckpointDir(str(ckpt))
    try:
        reliable_mode = sorted(
            map(tuple, graph.pagerank_integer(edges, iterations=3).collect())
        )
        written = [
            os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
        ]
        assert written, "reliable mode wrote nothing to the checkpoint dir"
    finally:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(_scala_none(sc))
        assert sc.getCheckpointDir() is None
    assert local_mode == reliable_mode and len(local_mode) == n
