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
from pyspark.storagelevel import StorageLevel


def cut_lineage(
    df: DataFrame, eager: bool = True, spill_only: bool = False
) -> DataFrame:
    """Materialization barrier: reliable checkpoint when a checkpoint dir
    is set, localCheckpoint otherwise.

    ``spill_only=True`` stores the local-checkpoint blocks DISK_ONLY —
    OUT of the JVM's unified memory pool. Use it for big, cold tables
    (the full-text docs table: read twice to build its narrow
    projections, then only by the caller): keeping multi-GB row blocks
    in the storage pool starves execution memory at low core counts
    (measured at 6.5M turns/local[2]/8 GB driver:
    UNABLE_TO_ACQUIRE_MEMORY abort once the r4 narrow-projection caches
    were added). With spark.local.dir on tmpfs the bytes still live in
    RAM, but outside the pool the execution allocator competes for."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    if spill_only:
        try:
            return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
        except TypeError:  # storageLevel param requires Spark >= 4.0
            return df.localCheckpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
