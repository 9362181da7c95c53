"""Bucketized range join == brute-force BETWEEN, including inclusive
boundary hits and intervals spanning many buckets; no cartesian node."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_range_join_equals_bruteforce(spark):
    from lazyosm_spark.operators.ranges import range_join

    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 1.0, 2.5, 5.0, 9.99, 10.0, 10.01, 50.0, 99.5])],
        "point_id long, value double",
    )
    ivs = spark.createDataFrame(
        [
            (0, 0.0, 0.0),      # degenerate single-value interval
            (1, 1.0, 10.0),     # inclusive both ends
            (2, 9.99, 10.01),   # straddles a bucket boundary
            (3, -5.0, 120.0),   # spans every bucket
            (4, 60.0, 70.0),    # matches nothing
        ],
        "interval_id long, lo double, hi double",
    )
    got = {
        (r["point_id"], r["interval_id"])
        for r in range_join(pts, ivs, bucket_width=7.0).collect()
    }
    want = {
        (r["point_id"], r["interval_id"])
        for r in pts.crossJoin(ivs)
        .filter(F.col("value").between(F.col("lo"), F.col("hi")))
        .collect()
    }
    assert got == want and (0, 0) in got and (5, 2) in got

    buf = io.StringIO()
    with redirect_stdout(buf):
        range_join(pts, ivs, bucket_width=7.0).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
