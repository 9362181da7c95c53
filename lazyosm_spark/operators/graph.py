"""Connected components over near-duplicate pairs: dedup GROUPING.

Pair generators (minhash LSH, simhash, embedding LSH) emit edges; a
training-data dedup pipeline then needs the transitive closure — one
canonical representative per duplicate CLUSTER, not per pair (a~b, b~c
must collapse a,b,c together even when a~c was never emitted).

Algorithms (both behind ``connected_components(algorithm=...)``):

- ``hash_to_min`` (default): iterative min-label propagation.  Every
  node starts as its own component; each round every node adopts the
  minimum label in its closed neighborhood; stop when no label
  changes.  One shuffle join + one aggregation per round, O(diameter)
  rounds — near-dup clusters have tiny diameters, so 2-4 rounds is
  typical.
- ``star``: alternating large-star/small-star (Kiveris et al. 2014,
  "Connected Components in MapReduce and Beyond").  Each round
  rewrites the EDGE set: large-star hooks every larger neighbor of u
  onto min(N(u) ∪ {u}); small-star re-hooks the smaller ones.  The
  edge set contracts toward stars rooted at each component's minimum
  in O(log n) rounds REGARDLESS of diameter — the swap-in for
  adversarially long paths/chains at 100 TB, where hash-to-min's
  O(diameter) bound is the failure mode.  Pytest pins a 10^4-node
  path graph to <= ~2 log2(n) rounds and both algorithms identical.

The DuckDB oracle (plans/driver_queries.py) computes the same
components independently via a recursive-CTE reachability closure —
min reachable node == converged min label, so the two agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lazyosm_spark.cache import free_local_checkpoint


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 50,
    algorithm: str = "hash_to_min",
    stats: dict | None = None,
) -> DataFrame:
    """nodes(id) x edges(src, dst) -> (id, component) where component =
    min node id reachable through the undirected edge set.  Isolated
    nodes are their own component.  ``algorithm``: 'hash_to_min'
    (O(diameter) rounds, default — near-dup graphs) or 'star'
    (O(log n) rounds — adversarial long chains).  ``stats`` (optional
    dict) receives {'rounds': n} for convergence accounting."""
    if algorithm == "star":
        return _cc_star(nodes, edges, node_col, src_col, dst_col, max_iters, stats)
    if algorithm != "hash_to_min":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # undirected: materialize both directions once
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct().persist()

    labels_ckpt = nodes.select(
        F.col(node_col).alias("id"), F.col(node_col).alias("component")
    ).localCheckpoint()
    labels = labels_ckpt

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
        # the previous round's checkpoint is superseded the moment nxt
        # is materialized — free it or leak one cached frame per round
        # (the FINAL checkpoint stays: it backs the returned frame)
        free_local_checkpoint(labels_ckpt)
        labels_ckpt = nxt
        labels = nxt.select("id", "component")
        if n_changed == 0:
            if stats is not None:
                stats["rounds"] = _ + 1
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iters")
    e.unpersist()
    return labels


def _cc_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    max_iters: int,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star/small-star.  Each round is two
    (groupBy-min + join) passes over the shrinking edge set; the edge
    set converges to stars (child -> component-min) in O(log n)
    rounds.  localCheckpoint per round truncates the iterative
    lineage (analyzer-stack trap, SURVEY §8)."""
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iters):
        # LARGE-STAR: u's larger neighbors hook onto m = min(N(u) ∪ {u})
        nbrs = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = nbrs.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            nbrs.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # SMALL-STAR: orient (hi -> lo); every lo-neighbor and hi itself
        # hook onto the minimum
        o = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        m2 = o.groupBy("u").agg(F.min("v").alias("m"))
        joined = o.join(m2, "u")
        small = (
            joined.select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(joined.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        # converged when the (canonical, already hi->lo-free) edge set
        # is unchanged; both sides are checkpointed so the two except
        # scans touch no upstream plan
        canon_old = e.select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        canon_new = small.select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        changed = (
            canon_new.exceptAll(canon_old).count()
            + canon_old.exceptAll(canon_new).count()
        )
        # old edge checkpoint is superseded by `small` — free it (the
        # final one stays: the returned frame reads it)
        free_local_checkpoint(e)
        e = small
        if changed == 0:
            break
    else:
        raise RuntimeError(f"star components did not converge in {max_iters} iters")
    if stats is not None:
        stats["rounds"] = rounds
    # converged edge set = stars (child, root=min); roots and isolated
    # nodes map to themselves
    child = e.select(
        F.greatest("a", "b").alias("id"), F.least("a", "b").alias("component")
    ).distinct()
    return (
        nodes.select(F.col(node_col).alias("id"))
        .join(child, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


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
