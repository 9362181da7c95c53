"""Cache-lifetime discipline for iterative operators.

Iterative DataFrame loops (connected components, simhash bucket
splitting, kNN radius ladders) must ``localCheckpoint()`` per round to
truncate the logical lineage (the analyzer-stack trap, SURVEY.md §8) —
but each checkpoint parks its blocks in the block manager for the
SESSION lifetime: Spark's ContextCleaner only frees them after a JVM GC
notices the RDD is unreachable, which on a long-lived driver can be
never.  An operator that runs R rounds therefore leaks R checkpointed
frames unless it frees the superseded ones itself.

``free_local_checkpoint`` releases the storage of a localCheckpointed
DataFrame **that will never be read again** (the previous round's
state, once the next round's checkpoint is materialized).  The frame is
unusable afterwards — its lineage was truncated, so there is nothing to
recompute from; only call it on state the operator provably no longer
references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def is_local_checkpoint(df: DataFrame) -> bool:
    """True when the frame's analyzed plan IS a bare localCheckpoint
    scan (LogicalRDD) — the shape free_local_checkpoint can release."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        return bool(plan.getClass().getName().endswith("LogicalRDD"))
    except Exception:
        return False


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the block-manager storage behind a localCheckpointed
    DataFrame.  No-op for non-checkpoint plans.  The frame must never
    be read again (see module docstring)."""
    try:
        if is_local_checkpoint(df):
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # cache hygiene must never fail a query (e.g. a plan wrapped by
        # further operators is not a bare LogicalRDD — harmless leak)
        pass


def n_persistent_rdds(spark) -> int:
    """Number of RDDs currently holding block-manager storage — the
    probe the persist-leak tests assert on."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()
