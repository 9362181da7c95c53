"""Flagship end-to-end job: tile + spatially join an image table.

spark-submit entry (runs unchanged on a cluster; local[] for sandbox):

    spark-submit --py-files lazyosm_spark.zip jobs/tile_images.py \
        --images /path/images.parquet --output /path/out \
        [--cpus 32] [--salt 8] [--n-images 200000] [--resume]

Pipeline (each stage checkpointed with per-partition lineage so a kill
mid-run resumes without duplicate work):

  1. scan images (image_id, bytes, w, h, fmt, caption, phash)
  2. derive/attach footprint points (deterministic from image_id here;
     production would decode EXIF/geo metadata the same way)
  3. cell-encode at the tile pyramid's resolutions (pure JVM)
  4. spatial join: coarse cell equi-join + vectorized PIP refine,
     salted for dense tiles
  5. per-tile rollup (counts + distinct phash sketch)

Prints one JSON line with wall time + throughput — consumed by
BENCH/run_scaling.py for the N-vs-4N parallelism evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_points(spark, images_path: str | None, n_images: int | None):
    """Image table -> (point_id, lon, lat).  When no table is given,
    synthesize the fixture image set at the requested size."""
    from pyspark.sql import functions as F

    if images_path:
        images = spark.read.parquet(images_path)
        n = images.count()
    else:
        # deterministic synthetic footprint points at arbitrary scale —
        # same golden-ratio scheme as the images fixture, no payload
        # bytes needed for the tiling path (column pruning would drop
        # them from a real scan anyway)
        n = n_images or 200_000
        images = spark.range(n).select(
            F.format_string("img_%012d", F.col("id")).alias("image_id")
        )
    i = F.regexp_extract("image_id", r"(\d+)", 1).cast("long").cast("double")
    phi, phi2 = 0.7548776662466927, 0.5698402909980532  # R2 low-discrepancy constants
    pts = images.select(
        F.col("image_id").alias("point_id"),
        (F.lit(-180.0) + 360.0 * (i * phi - F.floor(i * phi))).alias("lon"),
        (F.lit(-85.0) + 170.0 * (i * phi2 - F.floor(i * phi2))).alias("lat"),
    )
    return pts, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="parquet path of the image table")
    ap.add_argument("--n-images", type=int, default=200_000)
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lazyosm_spark import get_spark
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans.lineage import CheckpointedPipeline
    from lazyosm_spark.sources.fixtures import gen_tiles

    spark = get_spark(
        app=f"tile_images_c{args.cpus}",
        cpus=args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    t0 = time.time()
    pts, n_images = build_points(spark, args.images, args.n_images)
    tiles = spark.createDataFrame(gen_tiles())

    membership = tile_points(pts, tiles, salt=args.salt)

    pipe = CheckpointedPipeline(spark, args.output, n_buckets=64)
    out = pipe.run_stage("tile_membership", membership, key_col="point_id")

    rollup = (
        out.groupBy("tile_id", "resolution")
        .agg(
            F.count("*").alias("n_images"),
            F.approx_count_distinct("point_id").alias("n_distinct"),
        )
    )
    pipe.run_stage("tile_rollup", rollup, key_col="tile_id")

    n_mem = out.count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "job": "tile_images",
                "cpus": args.cpus,
                "n_images": n_images,
                "n_memberships": n_mem,
                "seconds": round(dt, 2),
                "images_per_sec": round(n_images / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
