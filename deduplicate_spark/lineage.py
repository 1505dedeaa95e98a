"""Lineage cutting that survives executor loss.

``localCheckpoint`` stores blocks on the executors that computed them AND
severs the logical lineage — on a multi-executor cluster a lost or evicted
block is unrecoverable (checkpointRDDBlockIdNotFound). ``cut_lineage``
therefore prefers a RELIABLE checkpoint (written to
``spark.sparkContext.setCheckpointDir`` storage — HDFS/S3 on a real
cluster, a shared tmpfs dir in local-cluster mode) whenever a checkpoint
dir is configured, and falls back to ``localCheckpoint`` in single-JVM
local[k] mode where executor loss cannot happen and the copy is cheaper.

Reference analog: the reference's memoized analysis DBs are durable files
(dupe_analysis.py:99-119) — intermediate state there also survives process
restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialization barrier: reliable checkpoint when a checkpoint dir
    is set, localCheckpoint otherwise."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
