"""Bloom semi-join reduction: exactness (== plain semi join), bounded
false-positive rate on the pre-filter, and the actual reduction (the
exact join's input carries only survivors)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bloom_semi_join_exact(spark):
    from lazyosm_spark.operators.bloom import bloom_semi_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    got = bloom_semi_join(
        li, o, key_col="l_orderkey", small_key_col="o_orderkey"
    )
    want = li.join(
        o.selectExpr("o_orderkey as l_orderkey").distinct(),
        "l_orderkey",
        "left_semi",
    )
    g = {tuple(r) for r in got.select("l_orderkey", "l_linenumber").collect()}
    w = {tuple(r) for r in want.select("l_orderkey", "l_linenumber").collect()}
    assert g == w and len(g) > 0
    # schema preserved: output columns are the big side's
    assert got.columns == li.columns


def test_bloom_build_and_probe_fp_rate(spark):
    """Members always hit (no false negatives); non-member hit rate is
    near the theoretical (1 - e^(-kn/m))^k for 10 bits/key, k=7."""
    from lazyosm_spark.operators.bloom import _positions, build_bloom

    n = 20_000
    members = spark.range(n).selectExpr("id as k")
    bm_bytes, m, k = build_bloom(members, "k")
    bm = np.frombuffer(bm_bytes, dtype=np.uint8)

    def probe(h64: np.ndarray) -> np.ndarray:
        pos = _positions(h64, m, k)
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(k):
            p = pos[i]
            byte = bm[(p >> np.uint64(3)).astype(np.int64)]
            hit &= ((byte >> (p & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        return hit

    # hashes must match the JVM's xxhash64 — read them back from Spark
    mh = np.array(
        [r["h"] for r in members.select(F.xxhash64("k").alias("h")).collect()],
        dtype=np.int64,
    )
    assert probe(mh).all()  # zero false negatives, ever
    non = spark.range(n, 2 * n).selectExpr("id as k")
    nh = np.array(
        [r["h"] for r in non.select(F.xxhash64("k").alias("h")).collect()],
        dtype=np.int64,
    )
    fp = probe(nh).mean()
    # theory ~0.8% at 10 bits/key (m rounded UP to a power of two, so
    # the realized rate is usually lower); 3% is a generous ceiling
    assert fp < 0.03, fp


def test_bloom_prefilter_reduces_join_input(spark):
    """The point of the operator: the exact join's left input is the
    bloom survivors, a small superset of the true matches — not the
    full big side."""
    from lazyosm_spark.operators.bloom import _positions, build_bloom

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    n_big = li.count()
    n_true = li.join(
        o.selectExpr("o_orderkey as l_orderkey").distinct(), "l_orderkey", "left_semi"
    ).count()
    bm_bytes, m, k = build_bloom(o, "o_orderkey")
    bm = np.frombuffer(bm_bytes, dtype=np.uint8)
    hs = np.array(
        [r["h"] for r in li.select(F.xxhash64("l_orderkey").alias("h")).collect()],
        dtype=np.int64,
    )
    pos = _positions(hs, m, k)
    hit = np.ones(pos.shape[1], dtype=bool)
    for i in range(k):
        p = pos[i]
        byte = bm[(p >> np.uint64(3)).astype(np.int64)]
        hit &= ((byte >> (p & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
    n_survivors = int(hit.sum())
    assert n_true <= n_survivors  # superset (no false negatives)
    # and a REAL reduction vs shuffling the whole big side
    assert n_survivors < 0.6 * n_big, (n_survivors, n_big)


def test_bloom_mixed_width_integral_keys_match(spark):
    """Round-4 ADVICE: int-vs-bigint keys SQL-compare equal but xxhash64
    differently — normalization must keep the build and probe aligned
    (before the fix, every true match was silently dropped)."""
    from lazyosm_spark.operators.bloom import bloom_semi_join

    big = spark.range(1000).selectExpr("cast(id as int) as k", "id * 2 as v")
    small = spark.range(0, 1000, 7).selectExpr("cast(id as bigint) as k")
    got = sorted(r["k"] for r in bloom_semi_join(big, small, "k").collect())
    want = sorted(range(0, 1000, 7))
    assert got == want


def test_bloom_incompatible_key_types_raise(spark):
    from lazyosm_spark.operators.bloom import bloom_semi_join

    big = spark.range(100).selectExpr("id as k")
    small = spark.range(10).selectExpr("cast(id as string) as k")
    try:
        bloom_semi_join(big, small, "k")
        raise AssertionError("expected ValueError for bigint-vs-string keys")
    except ValueError as e:
        assert "hash" in str(e)


def test_bloom_bitmap_size_guard(spark):
    from lazyosm_spark.operators.bloom import build_bloom

    small = spark.range(10).selectExpr("id as k")
    try:
        build_bloom(small, "k", n_keys=10**9, max_bitmap_bytes=1 << 20)
        raise AssertionError("expected ValueError for oversized bitmap")
    except ValueError as e:
        assert "max_bitmap_bytes" in str(e)


def test_bloom_hinted_path_runs_no_sizing_jobs(spark, monkeypatch):
    """With n_keys supplied, the operator must neither count() the
    small side nor touch .rdd for a partition probe (round-4 verdict
    item 5) — both are poisoned here and the join still runs."""
    import pyspark.sql.dataframe as pdf

    from lazyosm_spark.operators.bloom import bloom_semi_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    n_small = o.count()
    want = li.join(
        o.selectExpr("o_orderkey as l_orderkey").distinct(), "l_orderkey", "left_semi"
    ).count()

    def _poisoned_count(self):
        raise AssertionError("bloom_semi_join ran a sizing count() despite n_keys")

    monkeypatch.setattr(pdf.DataFrame, "count", _poisoned_count)
    monkeypatch.setattr(
        pdf.DataFrame,
        "rdd",
        property(
            lambda self: (_ for _ in ()).throw(
                AssertionError("bloom_semi_join touched .rdd")
            )
        ),
    )
    got = bloom_semi_join(
        li, o, key_col="l_orderkey", small_key_col="o_orderkey", n_keys=n_small
    )
    monkeypatch.undo()
    assert got.count() == want


def test_stage_row_count_from_lineage(spark, tmp_path):
    """stage_row_count derives the exact count from lineage metadata —
    the zero-extra-job n_keys source for checkpointed stages."""
    from lazyosm_spark.operators.bloom import stage_row_count
    from lazyosm_spark.plans.lineage import CheckpointedPipeline

    pipe = CheckpointedPipeline(spark, str(tmp_path), n_buckets=8)
    df = spark.range(1234).selectExpr("id as k", "id % 7 as v")
    pipe.run_stage("s1", df, "k")
    assert stage_row_count(spark, str(tmp_path), "s1") == 1234
