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


def test_dedup_representatives(spark):
    from lazyosm_spark.operators.graph import dedup_representatives

    nodes_df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges_df = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "src long, dst long")
    rows = {r["id"]: r for r in dedup_representatives(nodes_df, edges_df).collect()}
    reps = {i for i, r in rows.items() if r["is_representative"]}
    assert reps == {0, 3, 4}
    assert rows[2]["component"] == 0 and rows[5]["component"] == 4
