"""Spatial join + kNN vs brute-force oracles on tiny fixtures."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.oracle import reference_oracle as ro


def _points(n=200):
    phi, phi2 = 0.7548776662466927, 0.5698402909980532
    i = np.arange(n, dtype=float)
    lon = -180.0 + 360.0 * ((i * phi) % 1.0)
    lat = -85.0 + 170.0 * ((i * phi2) % 1.0)
    return [(f"p{j}", float(lon[j]), float(lat[j])) for j in range(n)]


def test_tile_points_matches_bruteforce_oracle(spark, fx):
    from lazyosm_spark.operators.spatial_join import tile_points

    pts = _points(300)
    pdf = spark.createDataFrame(pts, "point_id string, lon double, lat double")
    tiles = fx["tiles"]
    got = {
        (r["point_id"], r["tile_id"])
        for r in tile_points(pdf, tiles).collect()
    }
    # brute force: oracle pip over every (point, tile) pair
    want = set()
    for t in tiles.collect():
        ring = [tuple(p) for p in t["ring"]]
        if ring[0] == ring[-1]:
            ring = ring[:-1]
        for pid, lon, lat in pts:
            if ro.pip(ring, (lon, lat)):
                want.add((pid, t["tile_id"]))
    assert got == want


def test_tile_points_variants_agree(spark, fx):
    """broadcast (flagship) == shuffle == salted shuffle — the three
    physical strategies share exact semantics."""
    from lazyosm_spark.operators.spatial_join import tile_points, tile_points_shuffle

    pdf = spark.createDataFrame(
        _points(200), "point_id string, lon double, lat double"
    )
    base = {
        (r["point_id"], r["tile_id"])
        for r in tile_points(pdf, fx["tiles"]).collect()
    }
    shuffled = {
        (r["point_id"], r["tile_id"])
        for r in tile_points_shuffle(pdf, fx["tiles"]).collect()
    }
    salted = {
        (r["point_id"], r["tile_id"])
        for r in tile_points_shuffle(pdf, fx["tiles"], salt=8).collect()
    }
    assert base == shuffled == salted


def test_tile_points_skewed_hotspot(spark, fx):
    """Dense-city skew: 90% of points inside ONE tile's cell.  The
    salted shuffle variant must agree with broadcast, and salting must
    actually split the hot group across salt buckets."""
    from lazyosm_spark.operators.spatial_join import tile_points, tile_points_shuffle

    # pick one real tile and aim points at its ring centroid
    t = fx["tiles"].first()
    ring = [list(p) for p in t["ring"]]
    cx = sum(p[0] for p in ring) / len(ring)
    cy = sum(p[1] for p in ring) / len(ring)
    hot = [(f"h{i}", cx + (i % 7) * 1e-6, cy + (i % 5) * 1e-6) for i in range(900)]
    spread = _points(100)
    pdf = spark.createDataFrame(
        hot + spread, "point_id string, lon double, lat double"
    )
    base = {
        (r["point_id"], r["tile_id"])
        for r in tile_points(pdf, fx["tiles"]).collect()
    }
    salted = {
        (r["point_id"], r["tile_id"])
        for r in tile_points_shuffle(pdf, fx["tiles"], salt=8).collect()
    }
    assert base == salted
    # the hot tile must dominate membership (skew actually present)
    hot_members = sum(1 for pid, tid in base if tid == t["tile_id"])
    assert hot_members >= 800


def test_tile_points_auto_dispatches_to_shuffle(spark, fx):
    """Above broadcast_limit the flagship must take the shuffle path
    (no driver ring collect; grouped-refine Exchange in the plan) and
    produce identical membership."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from lazyosm_spark.operators.spatial_join import tile_points

    pts = spark.createDataFrame(
        [(f"p{i}",
          -180.0 + 360.0 * ((i * 0.7548776662466927) % 1.0),
          -85.0 + 170.0 * ((i * 0.5698402909980532) % 1.0))
         for i in range(300)],
        "point_id string, lon double, lat double",
    )
    bc = tile_points(pts, fx["tiles"])  # broadcast path
    sh = tile_points(pts, fx["tiles"], broadcast_limit=3)  # forced dispatch
    buf = io.StringIO()
    with redirect_stdout(buf):
        sh.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" in plan  # grouped refine, not collect
    assert "Exchange" in plan
    a = {tuple(r) for r in bc.select("point_id", "tile_id").collect()}
    b = {tuple(r) for r in sh.select("point_id", "tile_id").collect()}
    assert a == b and len(a) > 0


def test_dispatch_counts_cached(spark, fx):
    """Passing n_tiles / n_points skips the auto-dispatch/auto-res
    count JOB entirely (instance-level count() is poisoned to prove no
    call happens) and yields the identical result — the repeated-call
    fast path for pipelines reusing one tile pyramid / point cloud."""
    from lazyosm_spark.operators.knn import grid_knn
    from lazyosm_spark.operators.spatial_join import tile_points

    tiles = fx["tiles"]
    n_tiles = tiles.count()
    pts = spark.createDataFrame(
        [(str(i), -20.0 + i * 0.7, -10.0 + i * 0.4) for i in range(60)],
        "point_id string, lon double, lat double",
    )
    base = sorted(map(tuple, tile_points(pts, tiles).collect()))

    def boom():
        raise AssertionError("dispatch count() job ran despite the hint")

    poisoned = tiles.select("*")
    poisoned.count = boom  # instance-level: only the probe would hit it
    got = sorted(map(tuple, tile_points(pts, poisoned, n_tiles=n_tiles).collect()))
    assert got == base

    q = pts.selectExpr("point_id as query_id", "lon", "lat").limit(5)
    base_knn = sorted(map(tuple, grid_knn(q, pts, k=3).collect()))
    ppois = pts.select("*")
    ppois.count = boom
    got_knn = sorted(
        map(tuple, grid_knn(q, ppois, k=3, n_points=60).collect())
    )
    assert got_knn == base_knn


def test_polyfill_invariants(spark, fx):
    """Polyfill cells carry resolution+2, their centers are inside the
    tile's cell bbox, and an exact-bbox tile ring polyfills to exactly
    its 16 grandchildren (every finer-cell center is strictly interior)."""
    from pyspark.sql import functions as F

    from lazyosm_spark.functions.cells import cell_res
    from lazyosm_spark.operators.spatial_join import polyfill

    out = polyfill(fx["tiles"]).persist()
    j = out.join(fx["tiles"].select("tile_id", "resolution"), "tile_id")
    assert j.filter(cell_res(F.col("cell")) != F.col("resolution") + 2).count() == 0

    # exact-bbox rings: 5-point closed rectangles == the tile cell bbox
    exact = fx["tiles"].filter(F.size("ring") == 5).select("tile_id")
    counts = (
        out.join(exact, "tile_id").groupBy("tile_id").agg(F.count("*").alias("n"))
    )
    assert counts.count() > 0
    assert counts.filter(F.col("n") != 16).count() == 0


def test_rasterize_membership_roundtrip(spark, fx):
    """Raster cells partition each tile's members (sums match the
    membership counts), bins are in range, and raster_to_boxes rings
    contain the binned points' bbox."""
    from pyspark.sql import functions as F

    from lazyosm_spark.functions.cells import cell_bounds
    from lazyosm_spark.operators.spatial_join import (
        raster_to_boxes,
        rasterize_membership,
        tile_points,
    )

    pts = spark.createDataFrame(
        [(f"p{i}",
          -180.0 + 360.0 * ((i * 0.7548776662466927) % 1.0),
          -85.0 + 170.0 * ((i * 0.5698402909980532) % 1.0))
         for i in range(500)],
        "point_id string, lon double, lat double",
    )
    mem = tile_points(pts, fx["tiles"])
    raster = rasterize_membership(pts, mem, grid=4).persist()
    mem_counts = {
        r["tile_id"]: r["n"]
        for r in mem.groupBy("tile_id").agg(F.count("*").alias("n")).collect()
    }
    raster_sums = {
        r["tile_id"]: r["n"]
        for r in raster.groupBy("tile_id").agg(F.sum("n_points").alias("n")).collect()
    }
    assert raster_sums == mem_counts and len(raster_sums) > 0
    bad = raster.filter(
        (F.col("gx") < 0) | (F.col("gx") > 3) | (F.col("gy") < 0) | (F.col("gy") > 3)
    ).count()
    assert bad == 0

    boxes = raster_to_boxes(raster, grid=4)
    # every box ring sits inside its tile's cell bbox
    lon_min, lat_min, lon_max, lat_max = cell_bounds(F.col("tile_id"))
    eps = 1e-9
    out_of_tile = boxes.filter(
        (F.element_at(F.element_at("ring", 1), 1) < lon_min - eps)
        | (F.element_at(F.element_at("ring", 3), 1) > lon_max + eps)
        | (F.element_at(F.element_at("ring", 1), 2) < lat_min - eps)
        | (F.element_at(F.element_at("ring", 3), 2) > lat_max + eps)
    ).count()
    assert out_of_tile == 0


def test_grid_knn_equals_bruteforce(spark):
    from lazyosm_spark.operators.knn import grid_knn, knn_brute

    pts = _points(400)
    pdf = spark.createDataFrame(pts, "point_id string, lon double, lat double")
    q = spark.createDataFrame(
        [(pid, lon, lat) for pid, lon, lat in pts[:25]],
        "query_id string, lon double, lat double",
    )
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in grid_knn(q, pdf, k=5).collect()  # density-auto res
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_brute(q, pdf, k=5).collect()
    }
    assert got == want


def test_grid_knn_stream_explode_identical(spark):
    """The big-panel plan (pending broadcast un-exploded at res-1,
    POINTS exploded to ring_parent_cover — r6 optimization) must be
    bit-identical to the exploded-pending plan and to brute force:
    the candidate superset argument in grid_knn's docstring, pinned."""
    from lazyosm_spark.operators.knn import grid_knn, knn_brute

    pts = _points(400)
    pdf = spark.createDataFrame(pts, "point_id string, lon double, lat double")
    q = spark.createDataFrame(
        pts[:60], "query_id string, lon double, lat double"
    )
    kw = dict(k=5, n_points=400, n_queries=60)
    # explode_broadcast_rows=0 forces stream-explode at every level >= 1
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in grid_knn(q, pdf, explode_broadcast_rows=0, **kw).collect()
    }
    legacy = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in grid_knn(q, pdf, explode_broadcast_rows=1 << 40, **kw).collect()
    }
    brute = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in knn_brute(q, pdf, k=5).collect()
    }
    assert got == legacy == brute


def test_ring_parent_cover_superset(spark):
    """Property pin for cells.ring_parent_cover: for every cell C in
    k_ring(cell(p), ring), parent(C) is in ring_parent_cover(p, ring) —
    the containment that makes the stream-explode join a candidate
    superset — and the cover stays <= (ring+1)^2 cells, all in-grid."""
    from lazyosm_spark.functions.cells import (
        cell_encode,
        cell_parent,
        k_ring,
        ring_parent_cover,
    )

    pdf = spark.createDataFrame(
        _points(500), "point_id string, lon double, lat double"
    )
    for res, ring in [(1, 1), (3, 1), (7, 1), (7, 2), (12, 1)]:
        rows = pdf.select(
            F.transform(
                k_ring(cell_encode("lon", "lat", res), ring),
                lambda c: cell_parent(c, res - 1),
            ).alias("ring_parents"),
            ring_parent_cover("lon", "lat", res, ring).alias("cover"),
        ).collect()
        for r in rows:
            assert set(r["ring_parents"]) <= set(r["cover"]), (res, ring)
            assert len(r["cover"]) <= (ring + 1) ** 2
            assert len(set(r["cover"])) == len(r["cover"])


def _phash_corpus(spark, n_items: int, n_queries: int, n_clusters: int):
    """Deterministic near-dup phash world: cluster base = xxhash64 of
    the cluster id; members/queries flip 1..8 bits off the base —
    mirrors the real phash regime (tight clusters, small kth dist)."""
    from pyspark.sql import functions as F

    def flips(j_expr, seed: int):
        h = F.xxhash64(F.col("cluster").cast("string"))
        for t in range(8):
            bit = F.expr(
                f"shiftleft(cast(1 as bigint), cast((id * {seed} + {t} * 7) % 59 as int))"
            )
            h = F.when(F.lit(t) < j_expr, h.bitwiseXOR(bit)).otherwise(h)
        return h

    items = (
        spark.range(n_items)
        .withColumn("cluster", F.col("id") % n_clusters)
        .select(
            F.concat(F.lit("i"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
                "image_id"
            ),
            flips(F.col("id") % 3, 13).alias("phash"),
        )
    )
    queries = (
        spark.range(n_queries)
        .withColumn("cluster", F.col("id") % n_clusters)
        .select(
            F.concat(F.lit("q"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
                "image_id"
            ),
            flips(F.col("id") % 8, 29).alias("phash"),
        )
    )
    return items, queries


def test_phash_hamming_knn_equals_brute(spark):
    """The banded radius-ladder kNN must equal the crossJoin brute
    force exactly (ids, ranks, distances) on a 10^4-query panel, and
    its plan must contain no CartesianProduct/BroadcastNestedLoopJoin —
    the scan x |queries| shape the ladder exists to kill."""
    import io
    from contextlib import redirect_stdout

    from lazyosm_spark.operators.knn import phash_hamming_knn, phash_hamming_topk

    items, queries = _phash_corpus(spark, 4000, 10_000, 500)
    items, queries = items.persist(), queries.persist()
    # materialize=False: the default checkpoints the result, whose
    # explained plan is just a Scan ExistingRDD — the no-cartesian
    # assertions must see the LAZY ladder plan to mean anything
    lazy = phash_hamming_knn(items, queries, k=5, materialize=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        lazy.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # values from the same lazy plan (identical to the default path,
    # which only adds a checkpoint — pinned by fx_phash_hamming_knn)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in lazy.collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in phash_hamming_topk(items, queries, k=5).collect()
    }
    assert got == want and len(got) == 50_000


def test_phash_hamming_knn_fallback_exact(spark):
    """Queries whose kth neighbor is beyond the last radius finish on
    the salted equi-join fallback — still exact."""
    from pyspark.sql import functions as F

    from lazyosm_spark.operators.knn import phash_hamming_knn, phash_hamming_topk

    rows = [("a", 0), ("b", -1), ("c", 0x0F0F0F0F0F0F0F0F), ("d", 3)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in phash_hamming_knn(df, df, k=3, radii=(2,)).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in phash_hamming_topk(df, df, k=3).collect()
    }
    assert got == want and len(got) == 12


def test_cell_hierarchy_invariants(spark):
    from lazyosm_spark.functions import cells

    pdf = spark.createDataFrame(_points(500), "point_id string, lon double, lat double")
    df = pdf.select(
        cells.cell_encode("lon", "lat", 12).alias("fine"),
        cells.cell_encode("lon", "lat", 5).alias("coarse"),
    ).withColumn("parent", cells.cell_parent(F.col("fine"), 5))
    assert df.filter(F.col("parent") != F.col("coarse")).count() == 0

    # k_ring contains the center and only valid in-grid neighbors
    kr = pdf.select(
        "point_id", cells.cell_encode("lon", "lat", 6).alias("c")
    ).select("point_id", "c", F.explode(cells.k_ring(F.col("c"), 2)).alias("n"))
    center_present = kr.filter(F.col("c") == F.col("n")).count()
    assert center_present == 500
    sizes = (
        kr.groupBy("point_id").count().agg(F.min("count"), F.max("count")).first()
    )
    assert sizes[0] >= 9 and sizes[1] <= 25  # clipped at edges, max (2k+1)^2


def test_cell_bounds_roundtrip(spark):
    from lazyosm_spark.functions import cells

    pdf = spark.createDataFrame(_points(300), "point_id string, lon double, lat double")
    c = cells.cell_encode("lon", "lat", 9)
    lo_lon, lo_lat, hi_lon, hi_lat = cells.cell_bounds(c)
    bad = pdf.select(
        ((F.col("lon") >= lo_lon) & (F.col("lon") < hi_lon)
         & (F.col("lat") >= lo_lat) & (F.col("lat") < hi_lat)).alias("ok")
    ).filter(~F.col("ok"))
    assert bad.count() == 0


def test_grid_knn_prepared_points_identical(spark):
    """The prepare_points repeat-call fast path returns exactly the
    cold path's result — at the prepared resolution, at a different
    explicit resolution (coarser re-derive off the cache), and under
    escalation — and validates its inputs."""
    from lazyosm_spark.operators.knn import grid_knn, pick_res, prepare_points

    pts = _points(400)
    pdf = spark.createDataFrame(pts, "point_id string, lon double, lat double")
    q = spark.createDataFrame(
        [(pid, lon, lat) for pid, lon, lat in pts[:25]],
        "query_id string, lon double, lat double",
    )
    res = pick_res(400, 5)
    prep = prepare_points(pdf, res)
    try:
        cold = sorted(map(tuple, grid_knn(q, pdf, k=5).collect()))
        fast = sorted(
            map(
                tuple,
                grid_knn(
                    q, pdf, k=5, points_prepared=prep, prepared_res=res
                ).collect(),
            )
        )
        assert fast == cold and len(fast) > 0
        # explicit res != prepared_res: coarser cells re-derived from
        # the cached lon/lat — still identical
        other = sorted(
            map(
                tuple,
                grid_knn(
                    q,
                    pdf,
                    k=5,
                    res=max(res - 1, 0),
                    points_prepared=prep,
                    prepared_res=res,
                ).collect(),
            )
        )
        base = sorted(map(tuple, grid_knn(q, pdf, k=5, res=max(res - 1, 0)).collect()))
        assert other == base
    finally:
        prep.unpersist()
    try:
        grid_knn(q, pdf, k=5, points_prepared=prep)
        raise AssertionError("expected ValueError without prepared_res")
    except ValueError:
        pass
    try:
        grid_knn(q, pdf, k=5, points_prepared=pdf, prepared_res=res)
        raise AssertionError("expected ValueError for missing columns")
    except ValueError:
        pass
    # resolution drift: the frame is stamped/probed, a wrong
    # prepared_res must raise instead of silently joining zero rows
    prep2 = prepare_points(pdf, res)
    try:
        grid_knn(q, pdf, k=5, points_prepared=prep2, prepared_res=res + 1)
        raise AssertionError("expected ValueError for res drift")
    except ValueError:
        pass
    finally:
        prep2.unpersist()
