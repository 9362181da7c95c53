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

MEMORY BOUND (the whole point of sketching): the default path keeps
O(k) retained state per group per partition — an Arrow-batched partial
(mapInPandas) merges each batch into a sorted-unique array truncated to
k, then one groupBy merges the per-partition sketches by flatten +
re-truncate (collect_list there holds <= n_partitions arrays of <= k
each, not the raw distinct set).  k-minima distribute over union
(min_k(A ∪ B) = min_k(min_k(A) ∪ min_k(B))), so the merged sketch is
bit-identical to the single-pass formulation and partition-invariant.
``bounded=False`` keeps the one-expression collect_set twin (pytest
pins both identical) whose partial state is O(distinct-per-group) —
fine at bench scale, an executor OOM waiting to happen on a 100 TB
high-cardinality group.

The hash column is COALESCED to a -1 sentinel before crossing into
Arrow: a nullable long column with any null in a batch converts to
float64 in pandas, which silently rounds 60-bit hashes (> 2^53).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazyosm_spark.functions.hashing import md5_long, md5_long_sql

_U = float(1 << 60)  # md5_long range
_NULL_SENTINEL = -1  # md5_long is always >= 0


def _kmv_merge(state: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """Merge one batch of hashes into a bounded sketch: sorted-unique
    union, truncated to the k smallest.  THE retained state between
    batches — never more than k int64s per group."""
    merged = np.unique(np.concatenate([state, hashes]))
    return merged[:k]


def _bounded_partial_kmin(
    hashed: DataFrame, k: int, max_state_hashes: int | None
) -> DataFrame:
    """(group, h) -> one (group, kmin array<long>) row per group per
    partition.  Retained state: a dict of <= k-long arrays keyed by the
    groups seen in this partition (the same O(groups x k) footprint as
    any hash-aggregate partial).  ``max_state_hashes`` adds a worker-
    side assertion on the retained per-group state (test hook)."""
    gtype = hashed.schema["group"].dataType.simpleString()
    out_schema = f"group {gtype}, kmin array<long>"

    def part(batches):
        state: dict[object, np.ndarray] = {}
        empty = np.empty(0, dtype=np.int64)
        for pdf in batches:
            for g, sub in pdf.groupby("group", sort=False, dropna=False):
                arr = sub["h"].to_numpy(np.int64)
                arr = arr[arr != _NULL_SENTINEL]
                cur = state.get(g, empty)
                nxt = _kmv_merge(cur, arr, k)
                if max_state_hashes is not None and len(nxt) > max_state_hashes:
                    raise AssertionError(
                        f"KMV retained state {len(nxt)} > {max_state_hashes}"
                    )
                state[g] = nxt
        if state:
            yield pd.DataFrame(
                {
                    "group": list(state.keys()),
                    "kmin": [s.tolist() for s in state.values()],
                }
            )

    return hashed.mapInPandas(part, out_schema)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    bounded: bool = True,
    max_state_hashes: int | None = None,
) -> DataFrame:
    """-> (group, n_seen, est_distinct): the KMV estimate of
    count-distinct(value_col) per group (exact when distinct < k).

    ``bounded=True`` (default, the at-scale path): O(k) retained state
    per group per partial; ``bounded=False``: the single-expression
    collect_set twin (identical output, unbounded partials)."""
    h = md5_long(F.col(value_col).cast("string"))
    if bounded:
        hashed = df.select(
            F.col(group_col).alias("group"),
            F.coalesce(h, F.lit(_NULL_SENTINEL)).cast("long").alias("h"),
        )
        partials = _bounded_partial_kmin(hashed, k, max_state_hashes)
        agg = partials.groupBy("group").agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmin")))),
                1,
                k,
            ).alias("kmin")
        )
    else:
        agg = df.groupBy(F.col(group_col).alias("group")).agg(
            F.slice(F.array_sort(F.collect_set(h)), 1, k).alias("kmin")
        )
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
