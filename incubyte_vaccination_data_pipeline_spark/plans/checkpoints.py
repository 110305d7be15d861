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

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def durable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when the
    session has a checkpoint dir configured, ``localCheckpoint``
    otherwise.  Identical analyzed-plan shape either way.

    On the reliable path an eager checkpoint runs as a SEPARATE job
    from the computation that defined ``df`` — without a persist the
    checkpoint-write job recomputes the full lineage (~2x compute plus
    the distributed-FS write).  We therefore persist the frame for the
    duration of the eager materialization and release it immediately
    after (the checkpointed RDD is its own storage from then on).  A
    lazy reliable checkpoint (``eager=False``) materializes at the
    caller's first action, outside this function's scope; the input is
    persisted here too (r14 advice — without it the checkpoint-write
    job re-evaluates the full lineage once more whenever the first
    action lands), and released by the ContextCleaner once the frame
    is no longer referenced (``spark.cleaner.referenceTracking``, on
    by default) rather than by an explicit unpersist this function has
    no scope to place.

    Retention: reliable checkpoint files are NOT removed by
    ``unpersist()``; the session factory (``session.get_spark``) sets
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so the
    ContextCleaner deletes a checkpoint's files once its RDD is
    garbage-collected (e.g. after shared-cache eviction drops the last
    frame reference).  Long-lived deployments that disable the cleaner
    must sweep the checkpoint dir themselves.
    """
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        if eager:
            already_persisted = df.storageLevel != StorageLevel.NONE
            if not already_persisted:
                df.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                return df.checkpoint(eager=True)
            finally:
                if not already_persisted:
                    df.unpersist()
        # lazy reliable path: persist so the checkpoint-write job (at
        # the caller's first action) reads cached blocks instead of
        # re-running the lineage; the ContextCleaner releases it when
        # the frame is garbage-collected (see docstring)
        if df.storageLevel == StorageLevel.NONE:
            df.persist(StorageLevel.MEMORY_AND_DISK)
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=eager)
