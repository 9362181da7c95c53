"""KMV (k-minimum-values) distinct-count sketch.

The deterministic cousin of HyperLogLog: hash every value with a fixed
portable hash (md5 -> 60-bit uniform), keep the k SMALLEST distinct
hashes per group, and estimate |distinct| = (k-1) / u_k where u_k is
the k-th minimum normalized to [0, 1) (Bar-Yossef et al. 2002).  With
fewer than k distinct hashes the sketch IS the exact distinct count.

Unlike approx_count_distinct (HLL, engine-internal and unauditable),
every intermediate here is deterministic and portable, so the DuckDB
oracle reproduces the ESTIMATE bit-for-bit — a sketch whose accuracy
(~1/sqrt(k) relative error) AND implementation are both testable.
Sketches merge by union + re-truncate (reassociative), so partial
aggregation / multi-level rollups compose; at scale collect_set is
bounded per group by the distinct count, and a two-stage
bucketed-union variant bounds memory at k per partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazyosm_spark.functions.hashing import md5_long, md5_long_sql

_U = float(1 << 60)  # md5_long range


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """-> (group, n_seen, est_distinct): the KMV estimate of
    count-distinct(value_col) per group (exact when distinct < k)."""
    h = md5_long(F.col(value_col).cast("string"))
    kmin = F.slice(F.array_sort(F.collect_set(h)), 1, k)
    agg = df.groupBy(F.col(group_col).alias("group")).agg(kmin.alias("kmin"))
    n = F.size("kmin")
    kth = F.element_at("kmin", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / (kth.cast("double") / F.lit(_U))
    )
    return agg.select(
        "group",
        n.cast("long").alias("n_seen"),
        F.round(est, 6).alias("est_distinct"),
    )


def kmv_distinct_sql(
    table: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB twin: identical hash, identical k-minimum selection,
    identical estimate arithmetic."""
    h = md5_long_sql(f"CAST({value_col} AS VARCHAR)")
    return f"""
WITH km AS (
  SELECT {group_col} AS "group",
         (list_sort(list(DISTINCT {h})))[1:{k}] AS kmin
  FROM {table} GROUP BY 1)
SELECT "group",
       CAST(len(kmin) AS BIGINT) AS n_seen,
       round(CASE WHEN len(kmin) < {k} THEN CAST(len(kmin) AS DOUBLE)
                  ELSE {float(k - 1)!r} / (CAST(kmin[{k}] AS DOUBLE) / {_U!r}) END,
             6) AS est_distinct
FROM km
"""
