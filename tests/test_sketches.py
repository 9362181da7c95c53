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


def test_kmv_bounded_state_million_distinct():
    """Stream 10^6 distinct hashes through THE merge function the
    executor partial runs (_kmv_merge): retained state never exceeds k
    int64s, and the final sketch equals the true k minima — the bound
    that makes the operator safe on a 100 TB high-cardinality group."""
    import numpy as np

    from lazyosm_spark.operators.sketches import _kmv_merge

    k = 64
    rng = np.random.default_rng(7)
    hashes = rng.choice(np.int64(1) << 60, size=1_000_000, replace=False).astype(
        np.int64
    )
    state = np.empty(0, dtype=np.int64)
    max_retained = 0
    for off in range(0, len(hashes), 10_000):
        state = _kmv_merge(state, hashes[off : off + 10_000], k)
        max_retained = max(max_retained, len(state))
    assert max_retained <= k
    assert np.array_equal(state, np.sort(hashes)[:k])


def test_kmv_bounded_equals_unbounded(spark):
    """The O(k)-partial path is bit-identical to the collect_set twin
    (10^6 distinct values, one group, worker-side state assertion ON):
    partial truncation loses nothing because k-minima distribute over
    union."""
    from lazyosm_spark.operators.sketches import kmv_distinct

    df = spark.range(1_000_000).selectExpr("'g' AS grp", "id AS v")
    k = 64
    bounded = kmv_distinct(
        df, "grp", "v", k=k, bounded=True, max_state_hashes=k
    ).first()
    unbounded = kmv_distinct(df, "grp", "v", k=k, bounded=False).first()
    assert bounded["n_seen"] == unbounded["n_seen"] == k
    assert bounded["est_distinct"] == unbounded["est_distinct"]


def test_kmv_null_values_and_groups(spark):
    """Null values are skipped (sentinel path) exactly like collect_set
    does in the unbounded twin; an all-null group still emits a row."""
    from lazyosm_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("b", None)],
        "grp string, v long",
    )
    rows = {
        r["group"]: r
        for r in kmv_distinct(df, "grp", "v", k=8, bounded=True).collect()
    }
    assert rows["a"]["n_seen"] == 2 and rows["a"]["est_distinct"] == 2.0
    assert rows["b"]["n_seen"] == 0 and rows["b"]["est_distinct"] == 0.0
    un = {
        r["group"]: r
        for r in kmv_distinct(df, "grp", "v", k=8, bounded=False).collect()
    }
    assert {g: (r["n_seen"], r["est_distinct"]) for g, r in rows.items()} == {
        g: (r["n_seen"], r["est_distinct"]) for g, r in un.items()
    }
