"""Hypertable-style multi-granularity rollup (continuous aggregates).

Timescale-style hypertables answer time-bucket queries from
MATERIALIZED rollups, with each coarser granularity derived from the
next finer one rather than from raw data.  Same idea here, one
declarative plan: raw events aggregate once at the finest granularity;
every coarser level re-aggregates the previous level (counts and sums
are reassociative, so the reuse is lossless — the driver oracle proves
it by computing every level DIRECTLY from raw in DuckDB and matching
hashes).  At 100 TB this is the difference between one raw scan and
one scan per granularity; the fine rollup is also the natural
incremental checkpoint unit (plug into plans/lineage.run_stage keyed by
bucket_start).

-> (granularity, bucket_start, key, n, cents) stacked across levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# supported ladder, finest first; each entry truncates the previous
GRANULARITIES = ["hour", "day", "week"]


def hypertable_rollup(
    events: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Aggregate raw rows once at granularities[0]; derive each coarser
    level from the previous one.  Money math in integer cents (floor
    per row, summed exactly — the FP-stable cross-engine form)."""
    for g in granularities:
        if g not in GRANULARITIES:
            raise ValueError(f"unsupported granularity {g!r}")
    fine = granularities[0]
    level = (
        events.groupBy(
            F.date_trunc(fine, F.col(ts)).alias("bucket_start"),
            F.col(key).alias("key"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col(value) * 100).cast("long")).cast("long").alias("cents"),
        )
        .withColumn("granularity", F.lit(fine))
    )
    out = level
    for g in granularities[1:]:
        level = (
            level.groupBy(
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
                "key",
            )
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("cents").cast("long").alias("cents"),
            )
            .withColumn("granularity", F.lit(g))
        )
        out = out.unionByName(level)
    return out.select("granularity", "bucket_start", "key", "n", "cents")
