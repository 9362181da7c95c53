"""AQE skew-join evidence: the session conf bundle claims
spark.sql.adaptive.skewJoin handles skewed SHUFFLE JOINS (SURVEY §4 —
salting covers grouped refines, which AQE cannot split).  This test
proves the claim fires: a hot-key sort-merge join executed under
lowered skew thresholds must show the split in the final adaptive plan
(the SMJ node is annotated skew=true once AQE has divided the hot
partition)."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF_KEYS = [
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.coalescePartitions.enabled",
]


def test_aqe_skew_join_splits_hot_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONF_KEYS}
    try:
        # force a shuffle join and make the skew detector fire at
        # test-data sizes (production thresholds are 256MB-scale)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        # 90% of the left side shares one key — the dense-city analog
        left = spark.range(1_000_000).select(
            F.when(F.pmod(F.col("id"), 100) < 90, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(2_000).select(
            F.pmod(F.col("id"), 500).alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        # collect() (not first(): that wraps a separate limited plan)
        # executes THIS queryExecution so the final adaptive plan is
        # inspectable afterwards
        assert j.collect()[0]["s"] is not None
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
