"""KMV sketch: exact below k, within the ~1/sqrt(k) error band above
it, and merge-by-union composes (partial sketches == whole sketch)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kmv_exact_below_k(spark):
    from lazyosm_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("g", i % 37) for i in range(500)], "grp string, v long"
    )
    r = kmv_distinct(df, "grp", "v", k=64).first()
    assert r["n_seen"] == 37 and r["est_distinct"] == 37.0


def test_kmv_accuracy_above_k(spark):
    from lazyosm_spark.operators.sketches import kmv_distinct

    true_n = 5000
    df = spark.createDataFrame(
        [("g", i) for i in range(true_n)], "grp string, v long"
    )
    r = kmv_distinct(df, "grp", "v", k=64).first()
    assert r["n_seen"] == 64
    rel_err = abs(r["est_distinct"] - true_n) / true_n
    assert rel_err < 0.5, rel_err  # ~4 sigma at 1/sqrt(64)=12.5%


def test_kmv_merge_composes(spark):
    """Union of per-partition k-minimums re-truncated == the whole
    sketch (the property that makes partial aggregation sound)."""
    from lazyosm_spark.functions.hashing import md5_long
    from lazyosm_spark.operators.sketches import kmv_distinct

    k = 32
    df = spark.createDataFrame(
        [("g", i) for i in range(2000)], "grp string, v long"
    )
    whole = kmv_distinct(df, "grp", "v", k=k).first()["est_distinct"]
    h = md5_long(F.col("v").cast("string"))
    halves = [
        df.filter(F.col("v") % 2 == p)
        .groupBy("grp")
        .agg(F.slice(F.array_sort(F.collect_set(h)), 1, k).alias("kmin"))
        for p in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .select("grp", F.explode("kmin").alias("h"))
        .groupBy("grp")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("kmin"))
        .select(
            F.when(
                F.size("kmin") < k, F.size("kmin").cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.element_at("kmin", k).cast("double") / float(1 << 60))
            ).alias("est")
        )
        .first()["est"]
    )
    assert round(merged, 6) == whole
