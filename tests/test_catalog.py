"""Iceberg-style catalog surface: snapshots/files/stats metadata tables,
time travel by snapshot, zone-map bucket pruning."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_catalog_surface_and_time_travel(spark):
    from lazyosm_spark.plans import catalog
    from lazyosm_spark.plans.lineage import CheckpointedPipeline

    with tempfile.TemporaryDirectory() as root:
        pipe = CheckpointedPipeline(spark, root, n_buckets=8)
        df = spark.range(400).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("v")
        )
        # commit 1: half the buckets; commit 2: the rest
        half = df.filter(F.pmod(F.xxhash64("k"), F.lit(8)).cast("int") < 4)
        pipe.run_stage("s", half, key_col="k")
        pipe.run_stage("s", df, key_col="k")

        snaps = catalog.snapshots(spark, root).collect()
        assert [s["snapshot_id"] for s in snaps] == [0, 1]
        assert snaps[0]["rows"] < snaps[1]["rows"] == 400

        fls = catalog.files(spark, root, "s")
        assert fls.count() >= 8
        assert fls.agg(F.sum("size_bytes")).first()[0] > 0

        stats = catalog.table_stats(spark, root, "s")
        assert stats.select("bucket").distinct().count() == 8
        assert stats.filter(F.col("key_min") > F.col("key_max")).count() == 0

        # time travel: snapshot 0 sees only the first commit's rows
        v0 = catalog.read_stage(spark, root, "s", as_of_snapshot=0)
        v1 = catalog.read_stage(spark, root, "s", as_of_snapshot=1)
        assert v0.count() == snaps[0]["rows"]
        assert v1.count() == 400
        assert catalog.read_stage(spark, root, "s").count() == 400


def test_zone_map_bucket_pruning(spark):
    from lazyosm_spark.plans import catalog
    from lazyosm_spark.plans.lineage import CheckpointedPipeline

    with tempfile.TemporaryDirectory() as root:
        pipe = CheckpointedPipeline(spark, root, n_buckets=8)
        df = spark.range(1000).select(F.col("id").alias("k"))
        pipe.run_stage("s", df, key_col="k")
        got = catalog.prune_buckets(spark, root, "s", 100, 120)
        vals = {r["k"] for r in got.collect()}
        # pruning is a superset filter: every key in range must survive
        assert set(range(100, 121)) <= vals
        # and it must actually prune: hash-bucketed keys span all
        # buckets, so here pruning keeps everything — verify with a
        # range so narrow only some buckets' spans intersect is not
        # possible with xxhash bucketing; assert correctness only.
        assert got.count() <= 1000
