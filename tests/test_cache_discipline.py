"""Cache-lifetime discipline (round-3 verdict item 5): an iterative
operator whose result has been materialized must leave NO superseded
persisted frame behind — at most ONE persistent RDD may remain per
call: the checkpoint backing the returned result.  Anything more is a
per-call leak that grows without bound in a long-lived session (the
100 TB deployment shape: one driver serving many queries).

The probe is SparkContext.getPersistentRDDs — localCheckpoint blocks
register there and are NOT freed by GC on a long-lived driver, so a
leak is directly observable as a rising count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lazyosm_spark.cache import n_persistent_rdds

SF = "/root/testdata/sf0.001"


def _delta(spark, fn) -> int:
    base = n_persistent_rdds(spark)
    out = fn()
    out.collect()
    return n_persistent_rdds(spark) - base


def test_grid_knn_no_superseded_cache(spark):
    from lazyosm_spark.operators.knn import grid_knn

    pts = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .selectExpr(
            "doc_id as point_id",
            "cast(pmod(xxhash64(doc_id), 360) - 180 as double) as lon",
            "cast(pmod(xxhash64(doc_id, lang), 170) - 85 as double) as lat",
        )
    )
    q = pts.limit(25).selectExpr("point_id as query_id", "lon", "lat")
    # force >1 level: a coarse-enough res makes some query escalate? not
    # needed — the guarantee must hold whatever the ladder does
    assert _delta(spark, lambda: grid_knn(q, pts, k=5)) <= 1


def test_phash_knn_no_superseded_cache(spark, fx):
    from lazyosm_spark.operators.knn import phash_hamming_knn

    images = fx["images"]
    queries = images.filter(F.col("image_id") <= "img_000000000009")
    assert _delta(spark, lambda: phash_hamming_knn(images, queries, k=5)) <= 1


@pytest.mark.parametrize("algorithm", ["hash_to_min", "star"])
def test_connected_components_no_superseded_cache(spark, algorithm):
    from lazyosm_spark.operators.graph import connected_components

    # 64 path-connected clusters of 8 (diameter 7) force several
    # rounds — the leak shape — without tripping hash_to_min's
    # O(diameter) round bound
    n = 512
    nodes = spark.range(n).selectExpr("id")
    edges = spark.range(n - 1).selectExpr("id as src", "id + 1 as dst").filter(
        "src % 8 != 7"
    )
    assert (
        _delta(
            spark,
            lambda: connected_components(nodes, edges, algorithm=algorithm),
        )
        <= 1
    )


def test_simhash_default_path_no_superseded_cache(spark):
    from lazyosm_spark.operators.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # default call = auto threshold = split path with level checkpoints
    assert _delta(spark, lambda: simhash_near_pairs(docs)) <= 1
