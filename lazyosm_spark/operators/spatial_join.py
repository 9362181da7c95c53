"""The flagship spatial join: cell-key equi-join prefilter + PIP refine.

Distributes the reference's point-in-polygon theta-join (SURVEY.md §2.3
J6 — ray-cast Pip over ring vertices, relation_handler.go:43-81) as a
two-phase Spark plan:

  1. COARSE: encode each point to a cell id at every resolution the tile
     set uses (pure JVM arithmetic, functions/cells.py) and equi-join on
     cell == tile_id.  Because tile_id packs its resolution in the high
     bits, one long-vs-long equi-join handles a mixed-resolution tile
     pyramid.  Catalyst/AQE picks broadcast vs shuffle.
  2. REFINE: cogrouped applyInPandas per tile — one vectorized ray-cast
     (numpy, functions/geometry.pip_mask) of the tile's candidate point
     batch against its ring.  Cogroup means the ring ships once per
     group, not once per candidate row.

Skew (the "dense city" tile): ``salt=n`` splits each tile's candidate
batch across n subgroups — candidates get pmod(xxhash64(point_id), n),
tiles replicate n ways — so no single task owns a hot tile.  This plus
AQE skew-join is the engine's answer to the reference's LRU-thrash
Limit override (nodemap.go:156-158).

At 10^12 points the coarse join shuffles |points| × |resolutions| rows;
keep the tile pyramid to the 2-3 resolutions that bound tile sizes, and
pre-repartition points by cell with ``repartition_by_cell`` so repeated
joins reuse the partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazyosm_spark.functions.cells import cell_encode
from lazyosm_spark.functions.geometry import pip_mask

MEMBERSHIP_SCHEMA = "point_id string, tile_id long, resolution int"


def _refine(pdf: pd.DataFrame) -> pd.DataFrame:
    """One tile's candidate batch (ring constant within the group):
    one vectorized ray-cast of all points against the ring."""
    if len(pdf) == 0:
        return pd.DataFrame(columns=["point_id", "tile_id", "resolution"])
    ring = np.asarray([list(p) for p in pdf["ring"].iloc[0]], dtype=np.float64)
    if len(ring) > 1 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]  # implicit closing edge (reference wraparound)
    xy = np.column_stack(
        [pdf["lon"].to_numpy(np.float64), pdf["lat"].to_numpy(np.float64)]
    )
    inside = pip_mask(ring, xy)
    return pd.DataFrame(
        {
            "point_id": pdf["point_id"].to_numpy()[inside],
            "tile_id": pdf["tile_id"].iloc[0],
            "resolution": pdf["resolution"].iloc[0],
        }
    )


def tile_points(
    points: DataFrame,
    tiles: DataFrame,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
    salt: int | None = None,
    broadcast_limit: int = 200_000,
    n_tiles: int | None = None,
) -> DataFrame:
    """points(point_id, lon, lat) × tiles(tile_id, resolution, ring)
    -> exact membership (point_id, tile_id, resolution).

    SHUFFLE-FREE plan (the 100 TB path — the point side is never
    shuffled): cell-encode each point at the pyramid's resolutions
    (pure JVM), BROADCAST-join candidates against the tile keys
    (tile_id packs its resolution, so one long=long join covers a
    mixed-resolution pyramid), then refine with a vectorized pandas
    UDF that looks rings up in a broadcast dict and ray-casts each
    tile's batch slice in one numpy call.  Every stage is map-side;
    AQE/salting is unnecessary because no shuffle exists to skew.

    AUTO-DISPATCH: a tile set above ``broadcast_limit`` rows would OOM
    the driver collect, so it falls through to tile_points_shuffle
    (identical output, rings stay distributed) instead of leaving the
    caller a footgun.  ``tile_id`` must be unique (it is the key).
    ``n_tiles`` is the fast path: pass the (already known) tile count
    and the dispatch probe costs ZERO jobs — pipelines calling
    tile_points repeatedly on the same tile pyramid shouldn't re-scan
    it once per call (a pytest pins that no count job runs).

    Ring vertex-on-boundary semantics are the reference Pip's (bottom/
    left inclusive, top/right exclusive) — golden fixtures pin them.
    """
    import numpy as np  # local for the closure

    if (tiles.count() if n_tiles is None else n_tiles) > broadcast_limit:
        return tile_points_shuffle(points, tiles, point_id, lon, lat, salt)

    tile_rows = tiles.select("tile_id", "resolution", "ring").collect()
    res_list = sorted({int(r["resolution"]) for r in tile_rows})
    rings = {}
    for r in tile_rows:
        ring = np.asarray([list(p) for p in r["ring"]], dtype=np.float64)
        if len(ring) > 1 and (ring[0] == ring[-1]).all():
            ring = ring[:-1]
        rings[int(r["tile_id"])] = ring
    sc = points.sparkSession.sparkContext
    b_rings = sc.broadcast(rings)

    @F.pandas_udf("boolean")
    def inside_tile(tile_id: pd.Series, lon_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        ring_map = b_rings.value
        out = np.zeros(len(tile_id), dtype=bool)
        lon_v = lon_s.to_numpy(np.float64)
        lat_v = lat_s.to_numpy(np.float64)
        tid = tile_id.to_numpy(np.int64)
        # one vectorized ray-cast per distinct tile in the batch
        order = np.argsort(tid, kind="stable")
        sorted_tid = tid[order]
        bounds = np.flatnonzero(np.diff(sorted_tid)) + 1
        for seg in np.split(order, bounds):
            ring = ring_map.get(int(tid[seg[0]]))
            if ring is None or len(seg) == 0:
                continue
            xy = np.column_stack([lon_v[seg], lat_v[seg]])
            out[seg] = pip_mask(ring, xy)
        return pd.Series(out)

    pts = points.select(
        F.col(point_id).cast("string").alias("point_id"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    cells = pts.select(
        "point_id",
        "lon",
        "lat",
        F.explode(
            F.array(*[cell_encode(F.col("lon"), F.col("lat"), r) for r in res_list])
        ).alias("cell"),
    )
    keys = tiles.select(F.col("tile_id").alias("cell"), "tile_id", "resolution")
    cand = cells.join(F.broadcast(keys), "cell")
    return cand.filter(inside_tile(F.col("tile_id"), F.col("lon"), F.col("lat"))).select(
        "point_id", "tile_id", "resolution"
    )


def tile_points_shuffle(
    points: DataFrame,
    tiles: DataFrame,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
    salt: int | None = None,
) -> DataFrame:
    """Shuffle-based variant for tile sets too large to broadcast:
    coarse cell equi-join carrying the ring, then a grouped PIP refine
    per (tile[, salt-bucket]).  Salting splits hot tiles across tasks
    (the dense-city skew case).

    Note: a cogrouped refine (ring shipped once per group) segfaults
    pyarrow 16.1's cogroup serializer on multi-row batches —
    join+groupBy is the stable formulation.
    """
    res_rows = tiles.select("resolution").distinct().collect()
    res_list = sorted(int(r[0]) for r in res_rows)

    pts = points.select(
        F.col(point_id).cast("string").alias("point_id"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    cells = pts.select(
        "point_id",
        "lon",
        "lat",
        F.explode(
            F.array(*[cell_encode(F.col("lon"), F.col("lat"), r) for r in res_list])
        ).alias("cell"),
    )
    joined = cells.join(
        tiles.select(
            F.col("tile_id").alias("cell"), "tile_id", "resolution", "ring"
        ),
        "cell",
    )
    if salt:
        joined = joined.withColumn(
            "salt_b", F.pmod(F.xxhash64("point_id"), F.lit(salt)).cast("int")
        )
        grouped = joined.groupBy("tile_id", "salt_b")
    else:
        grouped = joined.groupBy("tile_id")
    return grouped.applyInPandas(_refine, MEMBERSHIP_SCHEMA)


def tile_points_coarse(
    points: DataFrame,
    tiles: DataFrame,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Coarse phase only (cell equi-join, no PIP) — exact when tile
    rings ARE their cell bboxes; also the SQL-oracle-checkable layer."""
    res_list = sorted(
        int(r[0]) for r in tiles.select("resolution").distinct().collect()
    )
    pts = points.select(
        F.col(point_id).cast("string").alias("point_id"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    cells = pts.select(
        "point_id",
        F.explode(
            F.array(*[cell_encode(F.col("lon"), F.col("lat"), r) for r in res_list])
        ).alias("cell"),
    )
    return cells.join(
        tiles.select(F.col("tile_id").alias("cell"), "tile_id", "resolution"),
        "cell",
    ).select("point_id", "tile_id", "resolution")


def polyfill(
    tiles: DataFrame,
    res_col=None,
    ring_col: str = "ring",
    id_col: str = "tile_id",
    max_cells_per_ring: int | None = 65536,
) -> DataFrame:
    """H3-polyfill analog: the cells at a (possibly per-row) resolution
    whose CENTERS lie inside each polygon ring — the standard polyfill
    containment rule.  Plan: ring bbox (JVM array math) -> cover_bbox
    cells (JVM) -> explode -> vectorized ray-cast of the cell centers
    (one Arrow batch pass, rings grouped within the batch).  No shuffle:
    everything is map-side over the tiles table.

    SCALE GUARD: a ring much larger than the target cell size explodes
    bbox_area/cell_area candidate rows — ``max_cells_per_ring`` FAILS
    the job (assert_true) instead of silently materializing an
    unbounded explode; pick a coarser res for continental polygons.
    The ``resolution + 2`` default ties the cell size to the tile's
    own scale (<= ~16 interior cells), so the guard never fires there.

    -> (tile_id, cell, center_lon, center_lat)."""
    from lazyosm_spark.functions.cells import cell_bounds, cover_bbox

    res = res_col if res_col is not None else (F.col("resolution") + 2)
    xs = F.transform(F.col(ring_col), lambda p: F.element_at(p, 1))
    ys = F.transform(F.col(ring_col), lambda p: F.element_at(p, 2))
    cover = cover_bbox(
        F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys), res
    )
    base = tiles.select(
        F.col(id_col).alias("tile_id"),
        F.col(ring_col).alias("_ring"),
        cover.alias("_cover"),
    )
    if max_cells_per_ring is not None:
        # assert_true must live in a FILTER — as a dropped projection
        # column Catalyst prunes it away and the check never runs
        base = base.filter(
            F.assert_true(
                F.size("_cover") <= max_cells_per_ring,
                F.concat(
                    F.lit("polyfill ring covers > max_cells_per_ring cells at tile "),
                    F.col("tile_id").cast("string"),
                ),
            ).isNull()
        )
    cand = base.select(
        "tile_id", "_ring", F.explode("_cover").alias("cell")
    )
    lon_min, lat_min, lon_max, lat_max = cell_bounds(F.col("cell"))
    cand = cand.select(
        "tile_id",
        "_ring",
        "cell",
        ((lon_min + lon_max) / 2).alias("center_lon"),
        ((lat_min + lat_max) / 2).alias("center_lat"),
    )

    @F.pandas_udf("boolean")
    def center_inside(
        tid_s: pd.Series, ring_s: pd.Series, lon_s: pd.Series, lat_s: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(ring_s), dtype=bool)
        lon_v = lon_s.to_numpy(np.float64)
        lat_v = lat_s.to_numpy(np.float64)
        tid = tid_s.to_numpy(np.int64)
        # one tile's exploded rows arrive contiguously: one vectorized
        # ray-cast per tile run (run boundaries by tile_id change)
        bounds = np.flatnonzero(np.diff(tid)) + 1
        for seg in np.split(np.arange(len(tid)), bounds):
            if len(seg) == 0:
                continue
            ring = np.asarray(
                [list(p) for p in ring_s.iloc[seg[0]]], dtype=np.float64
            )
            if len(ring) > 1 and (ring[0] == ring[-1]).all():
                ring = ring[:-1]
            xy = np.column_stack([lon_v[seg], lat_v[seg]])
            out[seg] = pip_mask(ring, xy)
        return pd.Series(out)

    return cand.filter(
        center_inside(
            F.col("tile_id"), F.col("_ring"), F.col("center_lon"), F.col("center_lat")
        )
    ).select("tile_id", "cell", "center_lon", "center_lat")


def rasterize_membership(
    points: DataFrame,
    membership: DataFrame,
    grid: int = 8,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Vector -> raster: bin each tile's member points into a grid x
    grid count raster over the tile's cell bbox (long form: one row per
    nonzero raster cell).  The north-star's raster<->vector leg: tile
    bounds come from pure cell-id arithmetic (tile_id packs res/x/y),
    so the whole transform is JVM columnar — one groupBy, no Python.

    -> (tile_id, resolution, gx, gy, n_points); gx/gy clamped to the
    grid so boundary points (PIP keeps bottom/left edges) stay inside.
    """
    from lazyosm_spark.functions.cells import cell_bounds

    pts = points.select(
        F.col(point_id).cast("string").alias("point_id"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    m = membership.join(pts, "point_id")
    lon_min, lat_min, lon_max, lat_max = cell_bounds(F.col("tile_id"))
    g = F.lit(float(grid))
    gx = F.least(
        F.lit(grid - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("lon") - lon_min) / (lon_max - lon_min) * g).cast("int"),
        ),
    )
    gy = F.least(
        F.lit(grid - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("lat") - lat_min) / (lat_max - lat_min) * g).cast("int"),
        ),
    )
    return (
        m.select("tile_id", "resolution", gx.alias("gx"), gy.alias("gy"))
        .groupBy("tile_id", "resolution", "gx", "gy")
        .agg(F.count("*").cast("long").alias("n_points"))
    )


def raster_to_boxes(raster: DataFrame, grid: int = 8, min_count: int = 1) -> DataFrame:
    """Raster -> vector: nonzero raster cells back to bbox polygons
    (rings as [[lon,lat],...], closed) — the inverse leg, again pure
    cell-id arithmetic + array construction (JVM)."""
    from lazyosm_spark.functions.cells import cell_bounds

    lon_min, lat_min, lon_max, lat_max = cell_bounds(F.col("tile_id"))
    g = F.lit(float(grid))
    cw = (lon_max - lon_min) / g
    ch = (lat_max - lat_min) / g
    x0 = lon_min + F.col("gx") * cw
    y0 = lat_min + F.col("gy") * ch
    ring = F.array(
        F.array(x0, y0),
        F.array(x0 + cw, y0),
        F.array(x0 + cw, y0 + ch),
        F.array(x0, y0 + ch),
        F.array(x0, y0),
    )
    return raster.filter(F.col("n_points") >= min_count).select(
        "tile_id", "resolution", "gx", "gy", "n_points", ring.alias("ring")
    )


def repartition_by_cell(df: DataFrame, cell_col: str, n: int) -> DataFrame:
    """Range-partition on cell id — co-locates spatially adjacent data
    (Z-order-ish locality), the shuffle-reuse analog of the reference's
    greedy block path (shortest_path.go:99-281, SURVEY.md §4)."""
    return df.repartitionByRange(n, F.col(cell_col))
