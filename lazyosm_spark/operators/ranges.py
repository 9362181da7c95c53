"""Range (interval) join — the bucketized formulation.

Spark's native BETWEEN join degenerates to BroadcastNestedLoop /
cartesian; the scalable shape is the same trick the spatial join uses
in 1-D: quantize values into fixed-width buckets, explode each interval
over the buckets it overlaps, equi-join on the bucket id, then apply
the exact BETWEEN filter.  Shuffle volume is |points| + |intervals| x
(interval_width / bucket_width + 1) — linear, no cross join; pick
``bucket_width`` near the typical interval width so intervals explode
to O(1) buckets (the 1-D analog of choosing the cell resolution).

Every row pair appears exactly once: a point lives in ONE bucket and an
interval covers each bucket at most once, so no distinct is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_width: float,
    point_id: str = "point_id",
    value: str = "value",
    interval_id: str = "interval_id",
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """points(point_id, value) x intervals(interval_id, lo, hi) ->
    (point_id, interval_id, value) for every lo <= value <= hi pair
    (inclusive bounds, the SQL BETWEEN the oracle runs)."""
    w = float(bucket_width)
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col(value).alias("value"),
        F.floor(F.col(value) / w).cast("long").alias("bucket"),
    )
    iv = intervals.select(
        F.col(interval_id).alias("interval_id"),
        F.col(lo).alias("lo"),
        F.col(hi).alias("hi"),
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                F.floor(F.col(hi) / w).cast("long"),
            )
        ).alias("bucket"),
    )
    return (
        p.join(iv, "bucket")
        .filter(F.col("value").between(F.col("lo"), F.col("hi")))
        .select("point_id", "interval_id", "value")
    )
