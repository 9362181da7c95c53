"""Connected components over near-duplicate pairs: dedup GROUPING.

Pair generators (minhash LSH, simhash, embedding LSH) emit edges; a
training-data dedup pipeline then needs the transitive closure — one
canonical representative per duplicate CLUSTER, not per pair (a~b, b~c
must collapse a,b,c together even when a~c was never emitted).

Algorithm: iterative min-label propagation (hash-to-min).  Every node
starts as its own component; each round every node adopts the minimum
label in its closed neighborhood; stop when no label changes.  Each
round is one shuffle join + one aggregation — no driver-side graph, no
cross join — and converges in O(diameter) rounds; near-dup clusters
have tiny diameters, so 2-4 rounds is typical.  Edges and labels stay
distributed throughout.  (For adversarially long path graphs at scale,
the O(log n)-round large-star/small-star variant swaps in behind the
same signature; near-dup graphs never need it.)

The DuckDB oracle (plans/driver_queries.py) computes the same
components independently via a recursive-CTE reachability closure —
min reachable node == converged min label, so the two agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """nodes(id) x edges(src, dst) -> (id, component) where component =
    min node id reachable through the undirected edge set.  Isolated
    nodes are their own component."""
    # undirected: materialize both directions once
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct().persist()

    labels = nodes.select(
        F.col(node_col).alias("id"), F.col(node_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iters):
        # neighbor-label minimum: edge (a,b) proposes b's label to a
        proposals = (
            e.join(labels.select(F.col("id").alias("b"), F.col("component").alias("nbr")), "b")
            .groupBy("a")
            .agg(F.min("nbr").alias("nbr_min"))
            .select(F.col("a").alias("id"), "nbr_min")
        )
        # localCheckpoint TRUNCATES the lineage each round — an
        # unbounded iterative plan otherwise grows linearly and blows
        # the analyzer/driver stack after ~20 rounds.  (On a cluster
        # with flaky executors use reliable checkpoint() instead.)
        nxt = (
            labels.join(proposals, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component")).alias(
                    "changed"
                ),
            )
        ).localCheckpoint()
        n_changed = nxt.filter("changed").count()
        labels = nxt.select("id", "component")
        if n_changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iters")
    e.unpersist()
    return labels


def dedup_representatives(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """-> (id, component, is_representative): keep rows where the node
    IS its cluster's min id — the 'drop transitive near-dups, keep one
    canonical doc per cluster' corpus filter."""
    comps = connected_components(nodes, edges, node_col, src_col, dst_col)
    return comps.withColumn(
        "is_representative", F.col("id") == F.col("component")
    )
