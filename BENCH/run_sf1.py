"""sf1 spot bench (round-4 verdict item 7): the headline queries at
~6M-lineitem scale to catch constants that only work at toy scale
(broadcast thresholds, bucket counts, resolution picks), plus a plan
gate — no query may flip to CartesianProduct / BroadcastNestedLoopJoin
at the bigger input.

Runs each query at sf0.1 AND sf1 in ONE exclusive session (two walls
each, min used for the ratio — the within-session variance rule), then
splices a marker-bounded section into BENCH/BASELINE.md.

`minhash_lsh` is excluded: its driver query is pinned to the FIXTURE
corpus (_fixture_scale), so its input does not grow with sf by design;
the simhash/minhash scale evidence lives in run_ops_scale.py instead.

Usage: python BENCH/run_sf1.py [--update-baseline]   (exclusive box!)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".bench_sf1")

def main() -> None:
    from pyspark.sql import functions as F

    import bench
    from lazyosm_spark import get_spark
    from lazyosm_spark.operators.knn import grid_knn
    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans import driver_queries as dq
    from lazyosm_spark.sources.fixtures import gen_tiles
    from tools.gen_sf import generate

    spark = get_spark(
        app="sf1_spot", cpus=32, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    generate(spark, SF01, SF1, 10)
    tiles = spark.createDataFrame(gen_tiles())
    n_tiles = tiles.count()

    def queries(sf_dir: str):
        pts = bench.lineitem_points(spark, sf_dir)
        n_points = pts.count()
        panel = bench.knn_panel(spark, sf_dir)
        n_q = panel.count()
        return {
            "spatial_join": lambda lazy=False: tile_points(
                pts, tiles, salt=4, n_tiles=n_tiles
            ),
            "tpch1_pricing": lambda lazy=False: dq.QUERIES["tpch1_pricing"](
                spark, sf_dir
            ),
            "way_node_assembly": lambda lazy=False: dq.QUERIES["way_node_assembly"](
                spark, sf_dir
            ),
            "cumsum_window": lambda lazy=False: dq.QUERIES["cumsum_window"](
                spark, sf_dir
            ),
            # lazy=True is for the PLAN GATE only: grid_knn's ladder
            # runs per-level emptiness counts and pins per-level caches
            # AT CALL TIME even with materialize=False, so the gate
            # variant runs on a 256-row panel slice (identical plan
            # shape — the broadcast dispatch uses the same n_queries
            # hint) and the caller clears caches before timing
            "grid_knn": lambda lazy=False: grid_knn(
                panel.limit(256) if lazy else panel,
                pts,
                k=5,
                n_points=n_points,
                n_queries=n_q,
                materialize=not lazy,
            ),
            "cosine_topk": lambda lazy=False: dq.QUERIES["cosine_topk"](
                spark, sf_dir
            ),
        }, n_points

    def plan_of(df) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # plan gate at sf1 BEFORE timing: CartesianProduct is banned
    # everywhere; BroadcastNestedLoopJoin is banned except in
    # cosine_topk, whose crossJoin(broadcast(10-row panel)) IS the
    # documented exact small-panel baseline (the items side is scanned,
    # never shuffled; LSH/IVF ANN are the big-panel paths)
    q1, n_points_sf1 = queries(SF1)
    plan_fail = []
    for name, fn in q1.items():
        p = plan_of(fn(lazy=True))
        if "CartesianProduct" in p:
            plan_fail.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in p and name != "cosine_topk":
            plan_fail.append(f"{name}: BroadcastNestedLoopJoin")
    if plan_fail:
        sys.exit("sf1 PLAN GATE FAILED: " + "; ".join(plan_fail))
    # drop anything the gate pinned (grid_knn's lazy ladder leaves its
    # per-level caches alive) so the timed region starts cold
    spark.catalog.clearCache()
    print("# sf1 plan gate: no CartesianProduct anywhere; no BNL outside the"
          " documented cosine_topk broadcast-panel baseline",
          file=sys.stderr, flush=True)

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        qs, n_points = queries(sf_dir)
        for name, fn in qs.items():
            walls = []
            rows = None
            for _ in range(2):
                t0 = time.time()
                rows = fn().count()
                walls.append(round(time.time() - t0, 2))
            results.setdefault(name, {})[sf_name] = {
                "walls_sec": walls,
                "rows": rows,
            }
            print(f"# {sf_name} {name}: {walls} ({rows} rows)", file=sys.stderr,
                  flush=True)
    for name, r in results.items():
        r["wall_ratio_sf1_over_sf01"] = round(
            min(r["sf1"]["walls_sec"]) / max(min(r["sf0.1"]["walls_sec"]), 1e-9), 2
        )
    out = {"n_points_sf1": n_points_sf1, "queries": results}
    print(json.dumps(out, indent=2))

    if "--update-baseline" not in sys.argv:
        return
    md = [
        "## sf1 spot bench (round 5)\n",
        "Headline queries at 10x input (6M lineitem / 200k part / 1M events /",
        "50k docs / 20k embeddings — `tools/gen_sf.py` key-offset replication of",
        "the sf0.1 driver testdata), run in ONE exclusive session against the",
        "same session's sf0.1 walls (two walls each, min-over-walls ratio).",
        "A 10x-input ratio near 10 is the linear-scaling expectation for",
        "scan/shuffle-bound plans on a fixed 32-core box; well BELOW 10 means",
        "fixed per-query overhead still dominates at sf0.1.  Plan gate",
        "(checked before timing; the run aborts on a flip): CartesianProduct",
        "banned everywhere; BroadcastNestedLoopJoin banned except cosine_topk,",
        "whose crossJoin(broadcast(10-row panel)) is the documented exact",
        "small-panel baseline (items side scanned, never shuffled).",
        "`minhash_lsh` is",
        "fixture-pinned (input does not scale with sf) — ops-scale evidence",
        "covers the dedup family at 10^6 instead.\n",
        "| query | sf0.1 walls (s) | sf1 walls (s) | sf1 rows | wall ratio (10x input) |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        md.append(
            f"| {name} | {r['sf0.1']['walls_sec']} | {r['sf1']['walls_sec']} | "
            f"{r['sf1']['rows']:,} | {r['wall_ratio_sf1_over_sf01']} |"
        )
    from tools.mdsplice import splice_marker_block

    splice_marker_block(
        os.path.join(REPO, "BENCH", "BASELINE.md"),
        "auto:sf1-spot",
        "\n".join(md),
        if_missing="append",
    )
    print("# BENCH/BASELINE.md updated", file=sys.stderr)


if __name__ == "__main__":
    main()
