"""Connected-components dedup grouping vs an independent scalar
union-find, on random graphs (multiple shapes: sparse, denser, chains
that need several propagation rounds)."""

from __future__ import annotations

import numpy as np


def _dsu_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id per component
    comp_min: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


def test_connected_components_random_graphs(spark):
    from lazyosm_spark.operators.graph import connected_components

    rng = np.random.default_rng(7)
    for n, n_edges in [(50, 20), (200, 150), (120, 400)]:
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _dsu_components(n, edges)
        nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges_df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(nodes_df, edges_df).collect()
        }
        assert got == want, (n, n_edges)


def test_connected_components_long_chain(spark):
    """A path graph forces the worst-case round count (diameter) — the
    convergence loop, not just one-hop propagation, is what's tested."""
    from lazyosm_spark.operators.graph import connected_components

    n = 24
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges_df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_star_components_match_hash_to_min(spark):
    """large-star/small-star == hash-to-min == scalar union-find on
    random graphs (shuffled ids so min-roots aren't trivially
    positional)."""
    from lazyosm_spark.operators.graph import connected_components

    rng = np.random.default_rng(23)
    for n, n_edges in [(60, 25), (150, 120), (100, 300)]:
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _dsu_components(n, edges)
        nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges_df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                nodes_df, edges_df, algorithm="star"
            ).collect()
        }
        assert got == want, (n, n_edges)


def test_star_components_path_graph_log_rounds(spark):
    """The adversarial case hash-to-min is slow on: a 10^4-node path
    graph (diameter 10^4).  The star algorithm must converge in
    O(log n) rounds — asserted <= ~2 log2(n) — and still produce the
    exact single component."""
    from pyspark.sql import functions as F

    from lazyosm_spark.operators.graph import connected_components

    n = 10_000
    nodes_df = spark.range(n).select(F.col("id"))
    edges_df = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    stats: dict = {}
    out = connected_components(
        nodes_df, edges_df, algorithm="star", stats=stats
    )
    assert out.filter(F.col("component") != 0).count() == 0
    assert out.count() == n
    import math

    assert stats["rounds"] <= 2 * math.ceil(math.log2(n)), stats


def test_dedup_representatives(spark):
    from lazyosm_spark.operators.graph import dedup_representatives

    nodes_df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges_df = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "src long, dst long")
    rows = {r["id"]: r for r in dedup_representatives(nodes_df, edges_df).collect()}
    reps = {i for i, r in rows.items() if r["is_representative"]}
    assert reps == {0, 3, 4}
    assert rows[2]["component"] == 0 and rows[5]["component"] == 4
