"""One-off profiling harness for the optimization round: times the
EXACT bench.py shape (``.count()``) of one headline query and dumps the
per-job/stage breakdown after each rep.  Evidence-only (bench.py is
frozen); exclusive box.

Usage: python BENCH/profile_count.py NAME [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_extra  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench_sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = bench_extra._get_spark()
    import bench
    from lazyosm_spark.operators.knn import grid_knn
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans import driver_queries as dq
    from lazyosm_spark.sources.fixtures import gen_tiles

    pts = bench.lineitem_points(spark, sf_dir)
    n_points = pts.count()
    panel = bench.knn_panel(spark, sf_dir)
    n_q = panel.count()
    tiles = spark.createDataFrame(gen_tiles())
    n_tiles = tiles.count()

    targets = {
        "spatial_join": lambda: tile_points(pts, tiles, salt=4, n_tiles=n_tiles),
        "tpch1_pricing": lambda: dq.QUERIES["tpch1_pricing"](spark, sf_dir),
        "way_node_assembly": lambda: dq.QUERIES["way_node_assembly"](spark, sf_dir),
        "cumsum_window": lambda: dq.QUERIES["cumsum_window"](spark, sf_dir),
        "grid_knn": lambda: grid_knn(panel, pts, k=5, n_points=n_points, n_queries=n_q),
        "minhash_lsh": lambda: dq.FIXTURE_QUERIES["fx_minhash_lsh_pairs"](spark, sf_dir),
        "cosine_topk": lambda: dq.QUERIES["cosine_topk"](spark, sf_dir),
    }
    fn = targets[name]
    spark.sparkContext.setJobDescription(f"profile_count:{name}")
    walls = []
    for rep in range(reps):
        marker = bench_extra._last_job(spark)
        t0 = time.time()
        n = fn().count()
        wall = time.time() - t0
        walls.append(round(wall, 2))
        bench_extra.dump_jobs(spark, marker, f"{name} rep{rep} wall={wall:.2f}s rows={n}")
    print(f"# {name} count-path walls: {walls}")
    spark.stop()


if __name__ == "__main__":
    main()
