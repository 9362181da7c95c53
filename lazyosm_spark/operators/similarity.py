"""Similarity search over embedding columns (array<float>).

- cosine_topk : brute-force exact top-k (baseline + oracle shape).
  Dot products stay JVM-side via zip_with + aggregate; the query side
  broadcasts.  Exact, O(|queries| x |items|) — for verification and
  small query fan-in.
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets
  (deterministic, seeded via md5 of (plane, dim)), equi-join on bucket
  across probe permutations, exact re-rank inside buckets.  Recall<1 by
  construction; measured against cosine_topk in tests.
- embedding_near_dup_pairs: near-duplicate pairs by cosine >= threshold
  via LSH buckets (the embedding leg of the dedup suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lazyosm_spark.functions.hashing import md5_long


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_unit_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn("_unit", F.transform(v, lambda x: x / _norm(v)))


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, neighbor_id, rank, cos) exact top-k by cosine.
    Ties break by neighbor id asc."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    it = items.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nv"),
    )
    cand = it.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (
        _norm(F.col("qv")) * _norm(F.col("nv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weight(plane: int, dim: int) -> int:
    """Deterministic ±1 from the parity of a portable hash — no RNG, so
    executors and tests agree without broadcasting plane matrices."""
    import hashlib

    h = hashlib.md5(f"plane{plane}:dim{dim}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


def lsh_bucket(vec_col, n_planes: int, dim: int, band: int, band_width: int):
    """Bucket key for one band of sign bits: bits [band*w, (band+1)*w)."""
    bits = []
    for p in range(band * band_width, (band + 1) * band_width):
        weights = F.array(
            *[F.lit(float(_plane_weight(p, d))) for d in range(dim)]
        )
        s = F.aggregate(
            F.zip_with(F.col(vec_col), weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s >= 0, F.lit(1)).otherwise(F.lit(0)))
    key = F.lit(0)
    for b in bits:
        key = key * 2 + b
    return key


def lsh_ann_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    bands: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates = pairs sharing any sign-bit band
    bucket; exact cosine re-rank within candidates.  Multi-band probing
    trades shuffle volume for recall."""
    bw = n_planes // bands

    def bucketed(df: DataFrame, role: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    lsh_bucket(vec_col, n_planes, dim, b, bw).alias("key"),
                )
                for b in range(bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(f"{role}_v"),
            F.explode(buckets).alias("bk"),
        ).select(
            f"{role}_id", f"{role}_v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )

    qb = bucketed(queries, "query")
    ib = bucketed(items, "neighbor")
    cand = (
        qb.join(ib, ["band", "key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "query_v", "neighbor_v")
        .distinct()
    )
    cos = _dot(F.col("query_v"), F.col("neighbor_v")) / (
        _norm(F.col("query_v")) * _norm(F.col("neighbor_v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    items: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    bands: int = 3,
) -> DataFrame:
    """Near-dup pairs (cos >= threshold) via LSH self-join, exact verify."""
    bw = n_planes // bands
    buckets = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                lsh_bucket(vec_col, n_planes, dim, b, bw).alias("key"),
            )
            for b in range(bands)
        ]
    )
    bd = items.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.explode(buckets).alias("bk"),
    ).select("doc_id", "v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bd.alias("a"), bd.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .distinct()
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
