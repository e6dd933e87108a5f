"""Connected components over near-duplicate candidate pairs.

LSH/SimHash/embedding blocking produces PAIRS; deduplication policy needs
GROUPS (pick one canonical doc per group of transitively-connected
near-duplicates). This is the missing middle stage: pairs → components →
keeper per component.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC'14). Each round rewires edges toward per-neighborhood
minima; the edge set converges to disjoint stars centered at each
component's minimum node id in O(log n) rounds REGARDLESS of graph
diameter — a 500-node path converges as fast as a 500-node clique.
(Min-label propagation, the naive alternative, needs O(diameter) rounds
and silently stalls on chain-shaped components.)

Scale shape (the 100 TB story):
  * each round is two star operations, each ONE hash aggregate (min per
    neighborhood) plus ONE shuffle-join back to the edges — no driver-side
    union-find, no collect of node data;
  * the edge set only shrinks or stays (|E| never grows beyond the
    symmetrized input), and stars collapse it geometrically;
  * `localCheckpoint` truncates the growing lineage each round (on a
    cluster, a checkpoint dir / persist-to-storage serves the same
    purpose);
  * convergence is an exact set-equality check: equal counts plus an
    empty anti-join — two cheap actions per round on a shrinking frame.

The result at fixpoint — component = min reachable node id — is
independent of iteration order, which is what makes it oracle-checkable
(DuckDB computes the same closure with WITH RECURSIVE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its LARGER neighbors to the minimum
    of its neighborhood (including itself). Input/output are canonical
    directed edges (u > v), distinct."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("m"))
        .select("u", F.least("u", "m").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every node connects its SMALLER-or-equal neighbors (and
    itself) to the minimum among them. Canonical (u > v) in and out."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        edges.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    own = mins.select("u", F.col("m").alias("v"))
    return rewired.unionByName(own).distinct()


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

    Raises RuntimeError if the star rounds do not reach a fixpoint within
    `max_iter` — with O(log n) convergence that only happens on inputs
    far beyond the intended scale, and wrong-but-silent labels are worse
    than a loud failure.
    """
    # Pin the incoming lineage ONCE: `nodes` and `cur` below each take an
    # eager checkpoint, and without this cut the caller's candidate
    # pipeline (an LSH band join, typically the most expensive upstream
    # stage) executes twice — measured 2.6 s doubled at sf0.1. Lazy: the
    # first action (nodes' eager checkpoint) materializes it.
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical big→small edge set, self-loops dropped
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = cur.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        # exact set equality: same count and nothing new on either side
        if nxt.count() == cur.count() and nxt.exceptAll(cur).isEmpty():
            converged = True
        cur = nxt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} star "
            "rounds; raise max_iter (rounds grow ~log n, so this input is "
            "far beyond the expected scale)"
        )
    # fixpoint = disjoint stars (node, center); centers label themselves
    return (
        nodes.join(
            cur.select(F.col("u").alias("node"), F.col("v").alias("comp")),
            "node",
            "left",
        )
        .select("node", F.coalesce("comp", "node").alias("component_id"))
    )


def incremental_components(
    new_edges: DataFrame,
    index: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Incremental connected components: fold a batch of NEW edges into an
    existing (node, component_id) assignment WITHOUT recomputing the full
    graph — the 100 TB dedup reality, where daily increments land against
    a corpus-scale component index.

    ``new_edges`` = pairs incident to new docs (batch↔batch and
    batch↔corpus); ``index`` = the prior full run's (node, component_id),
    where component_id = min member id. Exactness argument: each existing
    component is collapsed to its representative (= its min id), so
    min-reachability over {batch ids ∪ reps} equals min-reachability over
    the full node set, and a new doc bridging two old components merges
    them through their reps. The star rounds therefore run on a
    BATCH-SIZED graph; the corpus participates only through two id-keyed
    joins (endpoint→rep collapse, then touched-component relabel) — at
    scale both sides partition on the id, and the stored index would be
    bucketed so the relabel join is exchange-free. Returns the UPDATED
    (node, component_id) for every previously-labeled node plus every
    node of ``new_edges`` — equal, by construction, to a full recompute
    on the union graph (q_dedup_components_incremental pins this against
    the full-closure oracle)."""
    idx_s = index.select(F.col("node").alias("s"),
                         F.col("component_id").alias("_sc"))
    idx_d = index.select(F.col("node").alias("d"),
                         F.col("component_id").alias("_dc"))
    collapsed = (
        new_edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .join(idx_s, "s", "left")
        .join(idx_d, "d", "left")
        .select(
            F.coalesce("_sc", F.col("s")).alias("src"),
            F.coalesce("_dc", F.col("d")).alias("dst"),
        )
    )
    small = connected_components(collapsed, max_iter=max_iter)
    relab = small.select(F.col("node").alias("_rep"),
                         F.col("component_id").alias("_new"))
    relabeled = (
        index.join(relab, index["component_id"] == relab["_rep"], "left")
        .select(
            "node",
            F.coalesce("_new", F.col("component_id")).alias("component_id"),
        )
    )
    fresh = small.join(index.select("node"), "node", "left_anti")
    return relabeled.unionByName(fresh)


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
