"""Cluster-safe lineage truncation.

Iterative operators (pagerank, connected components, k-core, HITS,
k-means) and multi-consumer intermediates must cut lineage each round
or the plan grows without bound. ``DataFrame.localCheckpoint`` is the
fast cut — blocks stay in executor memory/disk — but those blocks are
NOT fault-tolerant: lose an executor after the cut and the RDD is
unrecoverable (job restart), which on a 1000-executor / 100 TB run is
a near-certainty over a long job. Reliable ``checkpoint()`` writes the
blocks to the cluster filesystem instead and survives executor loss.

``lineage_cut`` picks automatically: if a checkpoint directory is
configured on the SparkContext (``spark.sparkContext.setCheckpointDir``
— on a cluster, an HDFS/S3 path; the production entrypoint should set
it), it uses reliable ``checkpoint``; otherwise (local dev, tests,
bench) it uses ``localCheckpoint``. Every iterative operator in the
package routes through this helper, so flipping a deployment to
fault-tolerant cuts is one ``setCheckpointDir`` call, zero code edits.

See SCALING.md "Lineage cuts on a real cluster".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def lineage_cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage.

    Reliable ``checkpoint`` when ``sparkContext`` has a checkpoint dir
    configured (cluster-safe: blocks live on the cluster FS and survive
    executor loss); ``localCheckpoint`` otherwise (local mode — fast,
    no distributed FS required).

    ``eager=True`` materializes now (use when several consumers branch
    off the cut, or inside iteration so each round's work is pinned);
    ``eager=False`` defers materialization to the first action.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
