"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the flagship spatial join's wall time — points
derived deterministically from lineitem rows (the largest table) tiled
against the fixture tile pyramid — plus representative operators from
each SURVEY §2 family.  Throughput extras (rows/sec) ride along for
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def lineitem_points(spark, sf_dir):
    """One point per lineitem row: id + golden-ratio lon/lat (same
    low-discrepancy scheme as the fixtures)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    i = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("double")
    phi, phi2 = 0.7548776662466927, 0.5698402909980532  # R2 low-discrepancy constants
    return li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("point_id"),
        (F.lit(-180.0) + 360.0 * (i * phi - F.floor(i * phi))).alias("lon"),
        (F.lit(-85.0) + 170.0 * (i * phi2 - F.floor(i * phi2))).alias("lat"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from lazyosm_spark import get_spark
    from lazyosm_spark.operators.knn import grid_knn
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans import driver_queries as dq
    from lazyosm_spark.sources.fixtures import gen_tiles

    spark = get_spark(
        app="bench", cpus=CPUS, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        print(f"# running {name}...", file=sys.stderr, flush=True)
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.1f}s ({n} rows)", file=sys.stderr, flush=True)
        return n, dt

    # warm the JVM + parquet footers once
    pts = lineitem_points(spark, SF_DIR)
    n_points = pts.count()
    tiles = spark.createDataFrame(gen_tiles())

    # q1: flagship spatial join (coarse cell join + PIP refine)
    n_mem, dt = timed(
        "spatial_join", lambda: tile_points(pts, tiles, salt=4).count()
    )
    extras["spatial_join_points_per_sec"] = round(n_points / dt, 1)
    extras["spatial_join_memberships"] = n_mem

    # q2: TPC-H Q1 aggregation
    timed("tpch1_pricing", lambda: dq.QUERIES["tpch1_pricing"](spark, SF_DIR).count())

    # q3: the J1 workhorse join + ordered assembly
    timed(
        "way_node_assembly",
        lambda: dq.QUERIES["way_node_assembly"](spark, SF_DIR).count(),
    )

    # q4: prefix-sum window (delta decode analog)
    timed("cumsum_window", lambda: dq.QUERIES["cumsum_window"](spark, SF_DIR).count())

    # q5: grid kNN (part-derived queries vs lineitem-derived points)
    def knn_run():
        part = spark.read.parquet(os.path.join(SF_DIR, "part.parquet"))
        i = F.col("p_partkey").cast("double")
        phi, phi2 = 0.7548776662466927, 0.5698402909980532  # R2 low-discrepancy constants
        q = part.select(
            F.col("p_partkey").alias("query_id"),
            (F.lit(-180.0) + 360.0 * (i * phi - F.floor(i * phi))).alias("lon"),
            (F.lit(-85.0) + 170.0 * (i * phi2 - F.floor(i * phi2))).alias("lat"),
        )
        return grid_knn(q, pts, k=5).count()  # auto res from density

    timed("grid_knn", knn_run)

    # q6: minhash LSH dedup pipeline over documents
    timed(
        "minhash_lsh",
        lambda: dq.FIXTURE_QUERIES["fx_minhash_lsh_pairs"](spark, SF_DIR).count(),
    )

    # q7: cosine top-k over embeddings
    timed("cosine_topk", lambda: dq.QUERIES["cosine_topk"](spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": os.path.basename(SF_DIR.rstrip("/")),
                "cpus": CPUS,
                "n_points": n_points,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
