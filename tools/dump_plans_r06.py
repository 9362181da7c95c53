"""Dump .explain("formatted") for every headline query into
plans/r06/<query>_<suffix>.txt (round-6 optimization evidence).

Usage: python tools/dump_plans_r06.py before|after [sf_dir]

grid_knn is eager per level (the ladder runs emptiness counts at call
time), so its artifact is the materialize=False ladder plan — it shows
the per-level join strategy (broadcast side, exchange placement), which
is what the round's change targets.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"

    import bench
    from lazyosm_spark import get_spark
    from lazyosm_spark.operators.knn import grid_knn
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans import driver_queries as dq
    from lazyosm_spark.sources.fixtures import gen_tiles

    spark = get_spark(
        app="plans_r06", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
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
        "grid_knn": lambda: grid_knn(
            panel, pts, k=5, n_points=n_points, n_queries=n_q, materialize=False
        ),
        "minhash_lsh": lambda: dq.FIXTURE_QUERIES["fx_minhash_lsh_pairs"](spark, sf_dir),
        "cosine_topk": lambda: dq.QUERIES["cosine_topk"](spark, sf_dir),
    }
    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name, fn in targets.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan_of(fn()))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
