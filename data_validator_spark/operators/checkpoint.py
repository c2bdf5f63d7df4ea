"""Block cleanup for localCheckpoint-ed DataFrames.

``DataFrame.unpersist()`` on a localCheckpoint-ed frame is a silent
no-op: the checkpoint blocks belong to an internal RDD that is
RDD-persisted, not registered in the CacheManager that
``Dataset.unpersist`` consults (verified empirically on PySpark
4.1.2 — getRDDStorageInfo still shows every cached partition after
the call). Iterative operators that checkpoint per round therefore
leak up to max_iter copies of their working set into MEMORY_AND_DISK
until driver GC + ContextCleaner catch up.

The real handle is the LogicalRDD the checkpoint planted at the root
of the new plan — its ``rdd()`` IS the persisted RDD, and
unpersisting it JVM-side frees the blocks immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame, blocking: bool = False) -> bool:
    """Release the storage blocks behind a localCheckpoint-ed ``df``.

    Returns True if a checkpoint RDD was found and unpersisted. After
    this call ``df`` is NO LONGER COMPUTABLE (its lineage was
    truncated at the freed RDD) — only call it once every consumer of
    ``df`` is done."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getName() != "org.apache.spark.sql.execution.LogicalRDD":
        return False
    plan.rdd().unpersist(blocking)
    return True
