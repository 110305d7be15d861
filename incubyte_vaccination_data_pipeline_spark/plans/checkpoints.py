"""Durable lineage truncation: localCheckpoint locally, reliable
checkpoint on clusters.

Iterative operators (label propagation, Lloyd steps, prefix offsets)
and per-corpus index frames truncate lineage with ``localCheckpoint``
— correct and fast on ``local[*]``, but executor-loss-UNSAFE on a real
cluster: a localCheckpointed RDD stores its only copy in executor
memory/disk, so losing one executor kills every job that reads the
frame (and a shared-cache entry would keep handing out the broken
frame for the rest of the session).  Spark's reliable
``DataFrame.checkpoint`` writes to the fault-tolerant checkpoint dir
instead — same semantics, same analyzed-plan shape (LogicalRDD), no
recompute-on-loss problem.

:func:`durable_checkpoint` picks automatically: if the session has a
checkpoint directory configured (``spark.sparkContext.
setCheckpointDir(...)`` — HDFS/S3/DBFS on a cluster), it uses reliable
``checkpoint``; otherwise ``localCheckpoint``.  A 100 TB deployment
sets the dir once at session build; tests and the single-JVM driver
keep the local path with zero behavior change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def durable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when the
    session has a checkpoint dir configured, ``localCheckpoint``
    otherwise.  Identical analyzed-plan shape either way."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
