"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry lives in lazyosm_spark/plans/driver_queries.py — each
SQL-expressible operator of SURVEY.md §2 has a Spark/DuckDB twin pair;
geometry/fixture operators are rows-only (pytest carries their golden
oracles, tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the spatial join —
    derived points x tile pyramid, coarse cell equi-join + vectorized
    PIP refine, then a per-tile rollup."""
    from pyspark.sql import functions as F

    from lazyosm_spark.operators.spatial_join import tile_points
    from lazyosm_spark.plans.driver_queries import _doc_points
    from lazyosm_spark.sources.fixtures import gen_tiles

    sf_dir = "/root/testdata/sf0.001"
    pts = _doc_points(spark, sf_dir).selectExpr("doc_id as point_id", "lon", "lat")
    tiles = spark.createDataFrame(gen_tiles())
    membership = tile_points(pts, tiles)
    return (
        membership.groupBy("tile_id", "resolution")
        .agg(F.count("*").alias("n_points"))
        .orderBy(F.desc("n_points"), "tile_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lazyosm_spark.plans.driver_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    # same priority order as queries() so a capped driver run pairs
    # each executed query with its oracle
    from lazyosm_spark.plans.driver_queries import ORACLES, all_queries

    out = {n: ORACLES[n] for n in all_queries() if n in ORACLES}
    out.update({n: s for n, s in ORACLES.items() if n not in out})
    return out
