"""kNN operators: grid kNN via cell-ring expansion, phash Hamming top-k.

The reference has no kNN (SURVEY.md §2.3 last row); the north rule
mandates grid kNN via cell-ring expansion.  Design:

- encode queries and points at one resolution (JVM-side),
- join queries' k-ring cell arrays (functions/cells.k_ring) against
  points' cells — an equi-join after explode, no cross join,
- rank candidates per query with a window top-k,
- EXACTNESS: a neighbor found within ring radius R is only guaranteed
  k-nearest if its distance <= R * cell_size (anything outside the ring
  is at least that far).  Queries whose k-th candidate fails the bound
  (or with < k candidates) escalate to the next round with a doubled
  radius; the final round falls back to brute force for the stragglers.
  Each round is a plain Spark join — the loop is driver-side over
  DataFrames, never over rows.

Distance is planar Euclidean in degrees (documented engine semantic;
fixtures pin it).  Ties break by neighbor id ascending (SURVEY.md §7
determinism choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lazyosm_spark.functions.cells import cell_encode, k_ring
from lazyosm_spark.functions.hashing import hamming64


def _dist2(qlon, qlat, plon, plat):
    return (qlon - plon) * (qlon - plon) + (qlat - plat) * (qlat - plat)


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )


def grid_knn(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    res: int = 7,
    start_ring: int = 1,
    max_rounds: int = 3,
) -> DataFrame:
    """queries(query_id, lon, lat) × points(point_id, lon, lat) ->
    exact (query_id, neighbor_id, rank, dist)."""
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
        cell_encode("lon", "lat", res).alias("qcell"),
    )
    p = points.select(
        F.col("point_id").cast("string").alias("neighbor_id"),
        F.col("lon").alias("plon"),
        F.col("lat").alias("plat"),
        cell_encode("lon", "lat", res).alias("pcell"),
    )
    cell_h = 180.0 / (1 << res)  # lat extent of a cell (the tighter bound)

    # Each round materializes (persist) so the driver-side loop never
    # recomputes prior rounds' joins — without this, round N's anti-join
    # re-executes every upstream shuffle once per downstream action.
    pending = q.persist()
    done_parts: list[DataFrame] = []
    ring = start_ring
    n_pending: int | None = None  # unknown before round 1
    for _ in range(max_rounds):
        if n_pending == 0:
            break
        cand = (
            pending.select(
                "query_id", "qlon", "qlat", F.explode(k_ring("qcell", ring)).alias("pcell")
            )
            .join(p, "pcell")
            .select(
                "query_id",
                "neighbor_id",
                F.sqrt(
                    _dist2(F.col("qlon"), F.col("qlat"), F.col("plon"), F.col("plat"))
                ).alias("dist"),
            )
        )
        topk = _topk(cand, k).persist()
        # guarantee: k-th distance within the ring's safe radius (points
        # outside Chebyshev ring R are at least R*cell_h away)
        guarantee = float(ring * cell_h)
        ok_ids = (
            topk.groupBy("query_id")
            .agg(F.count("*").alias("n"), F.max("dist").alias("kth"))
            .filter((F.col("n") == k) & (F.col("kth") <= F.lit(guarantee)))
            .select("query_id")
            .persist()
        )
        done_parts.append(topk.join(ok_ids, "query_id", "left_semi"))
        nxt = pending.join(ok_ids, "query_id", "left_anti").persist()
        # materialize before unpersisting the parent; the count doubles
        # as next round's emptiness check (a limit(1).count() probe
        # would re-execute the whole upstream plan under AQE)
        n_pending = nxt.count()
        pending.unpersist()
        pending = nxt
        ring *= 2

    # brute-force only the stragglers (few, by construction; the ring
    # rounds have already satisfied every query with a provable bound)
    brute = pending.crossJoin(p).select(
        "query_id",
        "neighbor_id",
        F.sqrt(
            _dist2(F.col("qlon"), F.col("qlat"), F.col("plon"), F.col("plat"))
        ).alias("dist"),
    )
    done_parts.append(_topk(brute, k))
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out


def knn_brute(queries: DataFrame, points: DataFrame, k: int) -> DataFrame:
    """Reference-quality brute force (the oracle shape): cross join +
    window top-k.  Use only for verification / tiny query sets."""
    q = queries.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("lon").alias("qlon"),
        F.col("lat").alias("qlat"),
    )
    p = points.select(
        F.col("point_id").cast("string").alias("neighbor_id"),
        F.col("lon").alias("plon"),
        F.col("lat").alias("plat"),
    )
    cand = q.crossJoin(p).select(
        "query_id",
        "neighbor_id",
        F.sqrt(_dist2(F.col("qlon"), F.col("qlat"), F.col("plon"), F.col("plat"))).alias(
            "dist"
        ),
    )
    return _topk(cand, k)


def phash_hamming_topk(
    items: DataFrame, queries: DataFrame, k: int, id_col: str = "image_id", hash_col: str = "phash"
) -> DataFrame:
    """Top-k nearest by 64-bit Hamming distance (phash near-dup search).

    Reuses the reference's byte-vector Hamming idea
    (shortest_path.go:60-96) as bit_count(xor) on packed longs — fully
    JVM-side.  Queries broadcast (small side)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(hash_col).alias("qhash")
    )
    it = items.select(
        F.col(id_col).alias("neighbor_id"), F.col(hash_col).alias("nhash")
    )
    cand = it.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            hamming64("qhash", "nhash").cast("long").alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
