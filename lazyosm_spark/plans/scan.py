"""Scan-parallelism repair (guide §2.5 "input skew").

A parquet file is only splittable at row-group boundaries, so a table
written as one (or few) row groups caps every downstream map stage at
row-group parallelism no matter how many byte-range splits the planner
makes: the tasks whose range contains no row-group midpoint finish in
milliseconds while one task decodes the whole file.  Measured on this
box (BENCH/r06): sf0.1 tables are ALL single-row-group and sf1
lineitem carries 6 groups, so 32-core scans ran 1-6 wide with task-time
quantiles like [0.25, 0.28, 4.95, 5.12] s.

``ensure_scan_parallelism`` is the scale-adaptive fix: round-robin
repartition ONLY when the plan's actual partition count is far below
the session's parallelism.  A real 100 TB table produces thousands of
splits, the guard fails, and no shuffle is added — the repartition can
never fire on data large enough for it to hurt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_scan_parallelism(
    df: DataFrame, factor: int = 4, target: int | None = None
) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` (default
    defaultParallelism) when its current plan yields fewer than
    parallelism/``factor`` partitions (the skewed-input regime); return
    it unchanged otherwise.

    Partition count comes from the physical plan (no job is run).  Use
    on the input of CPU-heavy map work (Arrow UDFs, per-row hashing)
    whose source may be few-row-group parquet; do NOT use where the
    plan's no-shuffle property is itself the point (tile_points).

    ``target`` below core count is deliberate for MULTI-STAGE pipelines
    downstream of the repartition: on this box an (AQE) query stage
    costs a near-constant wall overhead that grows with its task count,
    so a pipeline of ~10 stages over the repartitioned cache wants just
    enough width to amortize the 1-2 heavy map stages (BENCH/r06
    minhash A/B: width 8 -> 2.4 s, 16 -> 3.3 s, 32 -> 5.6 s, unrepaired
    -> 4.2 s).  Single-heavy-stage consumers (grid_knn compact mode)
    use full parallelism.
    """
    sc = df.sparkSession.sparkContext
    dp = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # exotic plans (e.g. no RDD conversion) — leave as-is
        return df
    if nparts * factor <= dp:
        return df.repartition(target or dp)
    return df
