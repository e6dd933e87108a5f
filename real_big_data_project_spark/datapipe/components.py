"""Connected components over near-duplicate candidate pairs.

LSH/SimHash/embedding blocking produces PAIRS; deduplication policy needs
GROUPS (pick one canonical doc per group of transitively-connected
near-duplicates). This is the missing middle stage: pairs → components →
keeper per component.

Algorithm: iterative min-label propagation to a fixpoint — every node
repeatedly adopts the smallest component label among itself and its
neighbors. Converges in O(diameter) rounds; near-dup graphs are
overwhelmingly tiny cliques (diameter 1-2), so 2-3 rounds in practice.

Scale shape (the 100 TB story):
  * each round is ONE shuffle-join (labels ⋈ edges, both hash-partitioned
    on the node key) plus one hash aggregate — no driver-side union-find,
    no collect;
  * `localCheckpoint` truncates the growing lineage each round so the
    plan does not re-execute prior rounds (on a cluster, a checkpoint
    dir / persist-to-storage serves the same purpose);
  * convergence is detected from a 1-row aggregate: labels only ever
    decrease, so sum(label) is a strictly-decreasing potential function —
    stationary sum ⇔ fixpoint. One cheap action per round, no row-level
    diff join.

The result at fixpoint — component = min reachable node id — is
independent of iteration order, which is what makes it oracle-checkable
(DuckDB computes the same closure with WITH RECURSIVE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component_id) for every node appearing in `edges`, where
    component_id = min node id transitively reachable (including self).

    `edges` is an undirected pair list (each pair listed once, either
    orientation); isolated nodes are not represented (a node with no
    edges is trivially its own component).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Initial labels already fold in the first propagation round:
    # comp₀(node) = min(node, min neighbor) — one aggregate instead of a
    # distinct + a full round; clique-shaped near-dup graphs converge on
    # the very next stationarity check.
    labels = (
        sym.select(F.col("u").alias("node"), F.least("u", "v").alias("comp"))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        # neighbor labels ∪ own label → min per node
        prop = (
            sym.join(labels, sym["u"] == labels["node"])
            .select(F.col("v").alias("node"), F.col("comp"))
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("comp").alias("component_id"))


def dedup_components(
    pairs: DataFrame,
    left: str = "doc_a",
    right: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup clustering: candidate pairs → (doc_id, component_id,
    comp_size, is_keeper). The keeper is the smallest doc_id of its
    component — the same deterministic keeper policy as exact dedup
    (dedup_text.py::exact_dedup_groups)."""
    comp = connected_components(pairs, src=left, dst=right, max_iter=max_iter)
    w = Window.partitionBy("component_id")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component_id",
        F.count("*").over(w).cast("long").alias("comp_size"),
        (F.col("node") == F.col("component_id")).alias("is_keeper"),
    )
