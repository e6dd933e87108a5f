"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, nested-loop against the corpus — a map-only pass plus one tiny
per-query top-k shuffle, which scales linearly in corpus size on any
number of executors. The sign-LSH bucketed variant is the sublinear path:
one shuffle on the bucket key, each query probes only its own cell.

All vector math is JVM-side expressions on doubles (functions/vectors.py)
— no Python. Hot paths (per-candidate dots, corpus norms) use the
UNROLLED fixed-dim forms, which whole-stage-codegen compiles, instead of
interpreted higher-order-function folds; the accumulation order is
identical, so results are bit-equal to the HOF forms that remain as the
dim-unknown fallback. Similarities are rounded before thresholding /
ranking so the DuckDB oracle (different summation internals) agrees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import (
    cosine,
    cosine_given_norms,
    cosine_given_norms_fixed,
    infer_dim,
    norm,
    norm_fixed,
    sign_bucket,
)

SIM_ROUND = 5  # absorb cross-engine float-summation jitter
PERTURB_EPS = 0.01
DEFAULT_BUCKET_DIMS = list(range(8))
AUTO_TARGET_CELL = 32  # aimed-for vectors per LSH cell under auto sizing


def _cgn(a, b, na, nb, dim: int | None):
    """cosine_given_norms, codegen'd via the unrolled fixed-dim dot when
    the dimension is known (bit-identical — same accumulation order; see
    functions/vectors.py::dot_fixed), interpreted-HOF fallback otherwise.
    Candidate-heavy plans (every scored pair pays one dot fold) are
    dominated by the interpreted evaluator, not the shuffle."""
    if dim:
        return cosine_given_norms_fixed(a, b, na, nb, dim)
    return cosine_given_norms(a, b, na, nb)


def _norm(v, dim: int | None):
    return norm_fixed(v, dim) if dim else norm(v)


def auto_bucket_dims(
    n_vectors: int,
    target_cell: int = AUTO_TARGET_CELL,
    lo: int = 4,
    hi: int = 16,
) -> list[int]:
    """Size the sign-LSH cell count to the corpus: |dims| =
    ceil(log2(n / target_cell)), clamped to [lo, hi]. Fixed dims give a
    constant-factor candidate reduction but pair counts still grow
    O(n²/2^|dims|) — the round-4 sf1.0 sweep measured q_knn_graph at 38×
    for 10× vectors on the fixed 8-dim default. Scaling dims with log2(n)
    keeps expected cell size (and so per-vector candidate work) constant;
    tests/test_datapipe.py pins the growth factor. The cost of one extra
    dim is halved recall per cell — compensate with n_probe, which is
    O(probes) work, not O(cell²)."""
    # Integer arithmetic ONLY (no libm): d = smallest dim count with
    # target_cell·2^d ≥ n, clamped to [lo, hi] — equivalent to
    # ceil(log2(n/target_cell)) but reproducible bit-for-bit by a SQL
    # oracle (an integer search over range(lo, hi), no float log whose
    # last ulp could flip a ceil at the 2^k boundaries).
    d = lo
    while d < hi and target_cell * (1 << d) < max(1, n_vectors):
        d += 1
    return list(range(d))


def _resolve_dims(bucket_dims, emb: DataFrame, id_col: str) -> list[int]:
    """None → the fixed default (oracle-mirrored catalog configuration);
    "auto" → corpus-sized via auto_bucket_dims (one count job — an
    offline index build knows its corpus size anyway)."""
    if bucket_dims == "auto":
        return auto_bucket_dims(emb.select(id_col).count())
    return bucket_dims or DEFAULT_BUCKET_DIMS


def as_double(col: Column | str) -> Column:
    """array<float> → array<double>, as a codegen'd Cast (round 11): the
    previous ``transform(c, x -> cast(x))`` is a CodegenFallback
    higher-order function — interpreted per ROW on every vector path —
    where Cast over an array participates in whole-stage codegen, and
    SimplifyCasts removes it outright when the input is already
    array<double> (the k-means path re-deriving `v` from a pre-cast
    frame). float→double widening is exact, so values are bit-identical
    either way."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Total ranking (rounded sim DESC, neighbor_id ASC) → top-k rows.
    The per-query shuffle is tiny (#queries × candidates)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ann_brute_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, sim).

    The query side is broadcast (it is a handful of rows); the corpus side
    streams through a BroadcastNestedLoopJoin — no corpus shuffle. Norms
    are precomputed per vector so each scored pair pays one dot fold
    (cosine_given_norms).
    """
    dim = infer_dim(emb, vec_col)
    vecs = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("nv", _norm("v", dim))
    q = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"),
    )
    sim = F.round(_cgn("qv", "v", "qn", "nv", dim), SIM_ROUND)
    scored = (
        vecs.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    return _topk_per_query(scored, k)


def probe_buckets(v: Column | str, dims: list[int], n_probe: int) -> Column:
    """Multi-probe LSH bucket set: the vector's own sign bucket plus the
    buckets reached by flipping the single sign bit whose component is
    closest to the separating hyperplane (smallest |v[dim]|; ties break on
    the lower dim index — total, engine-portable ordering). Flipping the
    least-confident bits first is classic multi-probe LSH (Lv et al.,
    VLDB'07): it recovers the neighbors most likely to have landed one
    cell over, at the cost of probing ``n_probe`` cells instead of one —
    still sublinear, and no extra shuffle (the probe set rides on the
    broadcast query side)."""
    c = F.col(v) if isinstance(v, str) else v
    base = sign_bucket(c, dims)
    if n_probe <= 1:
        return F.array(base)
    # (|v[d]|, d) sorted ascending → the n_probe-1 least-confident dims.
    pairs = F.array(*[
        F.struct(
            F.abs(F.element_at(c, d + 1)).alias("a"),
            F.lit(d).alias("d"),
        )
        for d in dims
    ])
    flips = F.transform(
        F.slice(F.array_sort(pairs), 1, n_probe - 1), lambda s: s["d"]
    )
    # Bucket with dim f's bit flipped: bit_d = (v[d] >= 0) XOR (d == f).
    flipped = F.transform(
        flips,
        lambda f: F.concat(*[
            F.when((F.element_at(c, d + 1) >= 0) == (F.lit(d) != f), F.lit("1"))
            .otherwise(F.lit("0"))
            for d in dims
        ]),
    )
    return F.concat(F.array(base), flipped)


def ann_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bucket_dims: list[int] | None = None,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucketed ANN: vectors hash to a 2^|dims| cell by the sign
    pattern of fixed dimensions; each query probes its own cell plus, with
    ``n_probe`` > 1, the ``n_probe - 1`` nearest cells (least-confident
    sign bits flipped — see probe_buckets). Work per query is
    n_probe × cell size; recall is bounded (deterministic) and MEASURED by
    recall_at_k against ann_brute_topk (q_ann_recall pins it). Still one
    bucket-key join: the probe fan-out lives on the broadcast query side,
    so the corpus is never reshuffled."""
    dims = _resolve_dims(bucket_dims, emb, id_col)
    dim = infer_dim(emb, vec_col)
    vecs = emb.select(
        F.col(id_col),
        as_double(vec_col).alias("v"),
    ).withColumn("bucket", sign_bucket("v", dims)).withColumn(
        "nv", _norm("v", dim)
    )
    q = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("qn"),
            F.explode(probe_buckets("v", dims, n_probe)).alias("qbucket"),
        )
    )
    sim = F.round(_cgn("qv", "v", "qn", "nv", dim), SIM_ROUND)
    scored = (
        vecs.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("query_id")),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    )
    return _topk_per_query(scored, k)


def ann_bucket_recall_sweep(
    emb: DataFrame,
    query_ids: list[int],
    truth: DataFrame,
    k: int = 5,
    bucket_dims: list[int] | None = None,
    n_probes: tuple[int, ...] = (1, 2),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH recall@k at SEVERAL probe settings from ONE corpus scan —
    (query_id, n_true, recall_p{p}...) against exact ground truth
    (round 11; guide §2.4 "remove shuffles outright").

    The q_ann_recall builder previously ran ``ann_bucket_topk`` once per
    setting: two identical corpus scans + bucket joins + top-k windows +
    recall joins for two numbers. Same one-window trick as
    ``ann_ivf_recall_sweep``: scan once at max(n_probes) with each
    candidate carrying the rank of the probe that found it (1 = the
    query's own cell, 2 = its least-confident bit-flip cell, ... —
    ``probe_buckets`` order), and the n_probe=p top-k is the candidate
    set restricted to probe_rank ≤ p, ranked within the subset by a
    conditional running count over one (sim DESC, neighbor_id ASC)
    window. A (query, neighbor) pair matches exactly one probed cell
    (probe cells are pairwise distinct), so the restriction IS the
    smaller setting's candidate set and the subset rank reproduces its
    row_number — results bit-equal to the per-setting runs."""
    p_max = max(n_probes)
    dims = _resolve_dims(bucket_dims, emb, id_col)
    dim = infer_dim(emb, vec_col)
    vecs = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("bucket", sign_bucket("v", dims)).withColumn(
        "nv", _norm("v", dim)
    )
    q = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("qn"),
            F.posexplode(probe_buckets("v", dims, p_max)).alias(
                "_p0", "qbucket"
            ),
        )
        .select("query_id", "qv", "qn",
                (F.col("_p0") + 1).alias("probe_rank"), "qbucket")
    )
    sim = F.round(_cgn("qv", "v", "qn", "nv", dim), SIM_ROUND)
    scored = vecs.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col(id_col) != F.col("query_id")),
    ).select("query_id", "probe_rank",
             F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    run_w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_top = [
        (
            (F.col("probe_rank") <= p)
            & (
                F.sum(
                    F.when(F.col("probe_rank") <= p, 1).otherwise(0)
                ).over(run_w)
                <= k
            )
        )
        .cast("int")
        .alias(f"in_p{p}")
        for p in n_probes
    ]
    hits = (
        scored.select("query_id", "neighbor_id", *in_top)
        .filter(sum(F.col(f"in_p{p}") for p in n_probes) > 0)
    )
    recalls = [
        F.round(
            F.sum(F.coalesce(F.col(f"in_p{p}"), F.lit(0))) / F.count("*"),
            SIM_ROUND,
        ).alias(f"recall_p{p}")
        for p in n_probes
    ]
    return (
        truth.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_true"), *recalls)
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """(query_id, n_true, recall): fraction of the exact top-k actually
    returned by the approximate index. Denominator is the exact result's
    per-query row count (min(k, candidates)), so queries whose true
    neighborhood is smaller than k are not penalized. Both inputs use the
    shared (query_id, neighbor_id, rank, sim) top-k contract. Join keys
    are id-sized (|queries| × k rows) — driver-free, output-sized work."""
    truth = exact.select("query_id", "neighbor_id")
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(truth, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    denom = truth.groupBy("query_id").agg(F.count("*").alias("n_true"))
    return (
        denom.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_true",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_true"), SIM_ROUND
            ).alias("recall"),
        )
    )


CENTROID_ROUND = 6


def _with_lists(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    list_col: str,
    lists: DataFrame | None,
) -> DataFrame:
    """(id, label, v): attach the inverted-list assignment. `lists` is an
    offline clustering output ((id, list_col) — e.g.
    clustering.kmeans_assign); when absent, a `list_col` column already on
    `emb` is used. The lists frame is CORPUS-sized (one (id, label) row
    per vector), so this is an id-keyed shuffle join of two corpus-sized
    frames — the right shape at scale (both sides partition on the id;
    at 100 TB the assignment would be a stored table bucketed on the
    id, making this join exchange-free)."""
    if lists is None:
        return emb.select(F.col(id_col), F.col(list_col).alias("label"),
                          as_double(vec_col).alias("v"))
    return emb.select(F.col(id_col), as_double(vec_col).alias("v")).join(
        lists.select(F.col(id_col), F.col(list_col).alias("label")), id_col
    )


def _centroids(vecs: DataFrame, dim: int | None = None) -> DataFrame:
    """(label, centroid) — elementwise mean of each inverted list's
    members from a (label, v) frame. Centroids are ROUNDED so the
    probe-selection argmax is reproducible across engines.

    With a known dimension this is ONE hash aggregate straight to the
    centroid array (``array(round(avg(v[i]), dp), ...)``): one exchange
    of k×dim partials, no row explosion — the explode form it replaces
    shuffled an n×dim row stream through two exchanges for the same
    k×dim result (round 11; guide §2.3). Same value contract: identical
    per-(label, dim) value multisets, rounded to CENTROID_ROUND before
    any consumer. Dim-unknown falls back to the explode shape."""
    if dim:
        arr = ", ".join(
            f"round(avg(`v`[{i}]), {CENTROID_ROUND})" for i in range(dim)
        )
        return vecs.groupBy("label").agg(
            F.expr(f"array({arr})").alias("centroid")
        )
    dims = vecs.select(
        "label", F.posexplode("v").alias("dim", "val")
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.round(F.avg("val"), CENTROID_ROUND).alias("cval")
    )
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("_dc"))
        .select("label", F.transform("_dc", lambda x: x["cval"]).alias("centroid"))
    )


def ivf_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    lists: DataFrame | None = None,
) -> DataFrame:
    """(label, centroid) for each inverted list — see _centroids. The
    assignment comes from `lists` (offline k-means output) or an existing
    `list_col` column."""
    return _centroids(_with_lists(emb, id_col, vec_col, list_col, lists),
                      infer_dim(emb, vec_col))


def _probe_select(
    vecs: DataFrame,
    query_ids: list[int],
    cents: DataFrame,
    n_probe: int,
    id_col: str,
) -> DataFrame:
    """Shared IVF probe selection: (query_id, qv, qn, probe_rank,
    probe_label) — each query's ``n_probe`` nearest centroids under the
    total ordering (rounded sim DESC, label ASC). Both the serving path
    (ann_ivf_topk) and the recall sweep (ann_ivf_recall_sweep) MUST rank
    probes through this one function, or the sweep would grade a
    different probe set than the index serves."""
    q = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("label").asc()
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cosine("qv", "centroid"), SIM_ROUND))
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qv", "qn", "probe_rank",
                F.col("label").alias("probe_label"))
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    lists: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: each query picks its ``n_probe`` nearest centroids and
    scans ONLY those inverted lists — work per query is
    n_probe × |corpus|/n_lists. Recall grows with n_probe and is measured
    by recall_at_k against ann_brute_topk (q_ann_recall).
    Probe selection is a total ordering (rounded sim DESC, label ASC);
    final ranking reuses the shared top-k contract. Inverted lists come
    from `lists` (an offline clustering, e.g. clustering.kmeans_assign)
    or a pre-existing `list_col` column.

    When `lists` carries an expensive lineage (the iterative k-means
    plan), it is pinned with localCheckpoint: `vecs` fans out three ways
    below (centroid aggregate, query probe, inverted-list scan), and
    without the pin each consumer would re-execute the whole clustering
    — exactly what an offline IVF build materializes in practice."""
    dim = infer_dim(emb, vec_col)
    vecs = _with_lists(emb, id_col, vec_col, list_col, lists).withColumn(
        "nv", _norm("v", dim)
    )
    if lists is not None:
        # eager=False: pin the lineage cut but defer execution to the
        # first action — building the DataFrame (plan inspection, schema
        # checks) must not run the k-means job.
        vecs = vecs.localCheckpoint(eager=False)
    cents = _centroids(vecs, dim)
    probes = _probe_select(vecs, query_ids, cents, n_probe, id_col).drop(
        "probe_rank"
    )
    sim = F.round(_cgn("qv", "v", "qn", "nv", dim), SIM_ROUND)
    scored = (
        vecs.join(
            F.broadcast(probes),
            (F.col("label") == F.col("probe_label"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    )
    return _topk_per_query(scored, k)


def with_perturbed_copies(
    emb: DataFrame,
    eps: float = PERTURB_EPS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """embeddings ∪ planted near-duplicates: every even vec_id gets a copy
    at vec_id + (max(vec_id)+1), perturbed as x → x + eps·|x|
    (cosine ≈ 1 − O(eps²)). The offset is data-derived so planted ids
    never collide with real ones at any scale. The perturbation preserves
    every component's SIGN, so the sign-LSH blocking below provably
    co-buckets each copy with its original — an additive x+eps would flip
    bits on small components and silently drop ~25% of the planted pairs.
    The synthetic corpus has no natural near-dup pairs (max cosine ≈
    0.51), so detection needs planted positives — mirrored exactly in
    the oracle."""
    base = emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"))
    off = base.agg((F.coalesce(F.max("vec_id"), F.lit(0)) + 1).alias("_off"))
    if dim:
        # Unrolled (codegen) perturbation for a known dimension — the
        # transform() HOF below is CodegenFallback, interpreted per copy
        # row; element math identical (x + eps·|x| per component).
        pert = F.expr("array(" + ", ".join(
            f"`v`[{i}] + {eps!r}D * abs(`v`[{i}])" for i in range(dim)
        ) + ")")
    else:
        pert = F.transform("v", lambda x: x + eps * F.abs(x))
    copies = base.filter(F.col("vec_id") % 2 == 0).crossJoin(F.broadcast(off)).select(
        (F.col("vec_id") + F.col("_off")).alias("vec_id"),
        pert.alias("v"),
    )
    return base.unionByName(copies)


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.9,
    bucket_dims: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, sign-LSH blocked:
    (vec_a < vec_b, sim ≥ threshold), candidates limited to vectors whose
    sign buckets match (a true near-duplicate at cosine ≥ 0.9 almost
    surely agrees on every sign; the sign-preserving planted perturbation
    provably does). One shuffle on the bucket key.

    Plan shape: norms are attached per vector (one fold per row) and the
    scored candidate frame is CUT with a lazy localCheckpoint before the
    threshold filter — without the cut, Catalyst pushes `sim >= t` into
    the join condition, where the cosine fold is evaluated per candidate
    pair inside the join instead of once in a projection (measured ~5x
    slower at sf0.1). The checkpoint materializes only (id, id, sim) —
    candidate-sized, bucket-bounded."""
    dims = _resolve_dims(bucket_dims, emb, id_col)
    dim = infer_dim(emb, vec_col)
    vecs = with_perturbed_copies(
        emb, id_col=id_col, vec_col=vec_col, dim=dim
    ).withColumn(
        "bucket", sign_bucket("v", dims)
    ).withColumn("nv", _norm("v", dim))
    a = vecs.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                    F.col("bucket").alias("ba"), F.col("nv").alias("na"))
    b = vecs.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                    F.col("bucket").alias("bb"), F.col("nv").alias("nb"))
    sim = F.round(_cgn("va", "vb", "na", "nb", dim), SIM_ROUND)
    scored = (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .localCheckpoint(eager=False)
    )
    return scored.filter(F.col("sim") >= threshold)


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    bucket_dims: list[int] | None = None,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN GRAPH over the whole corpus: for EVERY vector, its
    top-k cosine neighbors within its sign-LSH cell(s).

    The all-pairs primitive behind near-dup graph construction and
    graph-based clustering — and the query where O(n²) actually kills
    you, because every vector is a query. The LSH cell gives a
    constant-factor reduction for a FIXED dim count: candidate pairs are
    Σ|cell|² ≈ n²/2^|dims| under a balanced hash, so keeping the work
    near-linear at growing corpus size requires scaling |dims| with
    log₂(n) (cells ≈ n / target-cell-size) — with fixed dims the pair
    count still grows O(n²/2^|dims|), just 2^|dims|× cheaper. Both sides
    partition on the bucket key in ONE shuffle, pairwise scoring happens
    only within cells, and the per-vector top-k is a second, output-sized
    shuffle. Recall is bounded by the probed cells (deterministic, not
    probabilistic-per-run) and measured by recall_at_k (q_ann_recall);
    ``n_probe`` > 1 widens each query's reach to its n_probe-1
    least-confident bit-flip cells (probe_buckets) — query-side fan-out
    only, the neighbor side is still hashed once."""
    dims = _resolve_dims(bucket_dims, emb, id_col)
    dim = infer_dim(emb, vec_col)
    vecs = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("bucket", sign_bucket("v", dims)).withColumn(
        "nv", _norm("v", dim)
    )
    a = vecs.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qn"),
        F.explode(probe_buckets("v", dims, n_probe)).alias("bucket"),
    )
    b = vecs.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v"),
        F.col("nv"),
        F.col("bucket").alias("nbucket"),
    )
    sim = F.round(_cgn("qv", "v", "qn", "nv", dim), SIM_ROUND)
    scored = (
        a.join(
            b,
            (F.col("bucket") == F.col("nbucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    return _topk_per_query(scored, k)


SEMDEDUP_TARGET_CLUSTER = 64
SEMDEDUP_K_LO = 4
# Raised 4096 → 65536 in round 10: the old cap priced the BRUTE n·k
# assignment (12.3B evals/pass at 3M vectors — the round-9 sf100
# timeout), but capping k re-grows cluster size linearly with n past
# 262k vectors, and the within-cluster scoring — O(n·s̄) pairs — became
# the measured wall at organic sf100 (~730-avg clusters → billions of
# pair cosines; 2h-CPU single aggregate tasks in the jstack). With the
# two-level assignment at n·O(√k), k can track the corpus again: the
# binding constraints are now the fine-centroid broadcast (65536×64
# doubles ≈ 33 MB — the classic broadcast comfort ceiling) and the
# kc=256-long probe buffer per vector, both fine at this cap.
SEMDEDUP_K_HI = 65536


def auto_semdedup_k(n_vectors: int, target_cluster: int = SEMDEDUP_TARGET_CLUSTER,
                    lo: int = SEMDEDUP_K_LO, hi: int = SEMDEDUP_K_HI) -> int:
    """Size k so expected cluster size stays ~target_cluster: the
    within-cluster scoring is O(n²/k), so a FIXED k re-grows quadratically
    with the corpus — the same failure mode auto_bucket_dims fixes for
    the sign-LSH family. k ≈ n / target keeps per-vector comparison work
    constant (SemDeDup runs k in the tens of thousands at web scale —
    affordable here because the two-level assignment is n·O(√k), not
    n·k; the `hi` cap is a broadcast-size bound, not a compute bound)."""
    return min(hi, max(lo, -(-max(n_vectors, 1) // target_cluster)))


def semantic_dedup(
    emb: DataFrame,
    k: int | str = 4,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster: int = SEMDEDUP_TARGET_CLUSTER,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster the embeddings with the engine's own
    k-means, compare vectors ONLY within their cluster, and drop every
    vector that has a smaller-id neighbor at cosine ≥ threshold. Returns
    (vec_id, label, keep).

    Scale contract: the within-cluster scoring is quadratic in the
    cluster size, so k must grow with the corpus (k ≈ n / desired_cluster
    — the same rule as auto_bucket_dims; SemDeDup itself runs k in the
    tens of thousands at web scale). Clustering is broadcast-centroid
    map-only passes; the pair join shuffles once on the cluster label;
    the keep flag is one id-keyed left join. Planted perturbed copies
    (with_perturbed_copies) provide the positives on the natural-dup-free
    synthetic corpus, exactly as in embedding_near_duplicates."""
    from .clustering import kmeans_assign

    # Pin the perturbed corpus: k-means re-reads its input on every
    # assignment pass (plus the seed TakeOrdered and the keep join), and
    # the planted-copy union's lineage (offset aggregate + transform)
    # would otherwise re-execute with each pass.
    dim = infer_dim(emb, vec_col)
    vecs = with_perturbed_copies(
        emb, id_col=id_col, vec_col=vec_col, dim=dim
    ).localCheckpoint(eager=False)
    two_level = False
    if k == "auto":
        # one count job — an offline dedup run knows its corpus size
        # anyway. `target_cluster` is the recall-vs-cost dial: smaller
        # clusters cut the quadratic within-cluster scoring (~n·target/2
        # pairs) but split more true near-dup pairs across fine-cluster
        # boundaries (measured curve: tools/semdedup_recall_dial.py →
        # PERF_NOTES "SemDeDup recall dial").
        k = auto_semdedup_k(vecs.count(), target_cluster=target_cluster)
        # Corpus-scaled k takes the two-level (coarse→fine) assignment:
        # brute n·k at the 4096 auto-cap was the measured sf100 scale
        # wall (~25B distance evals, sweep timeout — VERDICT r9 item 2);
        # two-level is n·O(√k) per pass. Fixed-k callers (the k=16
        # catalog oracle pin) keep the exact brute argmin.
        two_level = True
    asg = kmeans_assign(
        vecs, k=k, n_assign=2, id_col="vec_id", vec_col="v",
        two_level=two_level, dim=dim,
    )
    lv = vecs.join(
        asg.select("vec_id", F.col("cluster").alias("label")), on="vec_id"
    ).withColumn("nv", _norm("v", dim))
    # Pin the labeled vectors: `lv` fans out into both sides of the pair
    # join AND the final keep join, and its lineage is the full live
    # k-means (two broadcast-centroid assignment passes over the corpus)
    # — unpinned, Spark re-executes that clustering three times. An
    # offline SemDeDup run stores its assignment for the same reason.
    # The norm rides along so the pinned frame carries it precomputed.
    lv = lv.localCheckpoint(eager=False)
    a = lv.select(F.col("vec_id").alias("_ia"), F.col("v").alias("va"),
                  F.col("label").alias("la"), F.col("nv").alias("na"))
    b = lv.select(F.col("vec_id").alias("_ib"), F.col("v").alias("vb"),
                  F.col("label").alias("lb"), F.col("nv").alias("nb"))
    # Aggregate the per-candidate MAX similarity instead of
    # filter-then-distinct: a filter on the pair sim gets pushed into
    # the join condition, where the cosine fold is evaluated inside the
    # join loop (interpreted, per pair — measured 5x slower than the
    # same fold in a projection at sf0.1). The max-aggregate consumes
    # the projected sim, keeps the join condition to the cheap
    # label/id comparisons, and map-side-combines to one row per
    # candidate before the shuffle. NULL sims (zero-norm vectors) are
    # ignored by MAX, matching the filter's NULL-drops semantics.
    sim = _cgn("va", "vb", "na", "nb", dim)
    dup = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("_ib") < F.col("_ia")))
        .select(F.col("_ia").alias("vec_id"),
                F.round(sim, SIM_ROUND).alias("sim"))
        .groupBy("vec_id")
        .agg(F.max("sim").alias("_max_sim"))
        .filter(F.col("_max_sim") >= threshold)
        .select("vec_id")
    )
    return (
        lv.join(dup.withColumn("_dup", F.lit(True)), on="vec_id", how="left")
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


SQ8_LEVELS = 127


def quantize_sq8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: scale = max|x|/127,
    q_i = floor(x_i / scale + 0.5) stored as TINYINT — 8× smaller than the
    float64 column (4× vs float32), the difference between an embedding
    corpus that fits executor memory at 100 TB scale and one that spills.
    Returns (vec_id, q: array<tinyint>, scale).

    floor(x + 0.5) rather than round(): half-up is representation-exact
    and identical across engines (the oracle mirrors it), where round()'s
    half-even/half-away convention differs. A zero vector quantizes to
    all-zero (scale 0 guard). |x/scale| ≤ 127 by construction, so no
    clamp is needed and the tinyint cast cannot wrap."""
    base = emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v"))
    return (
        base.withColumn(
            "scale",
            F.array_max(F.transform("v", lambda x: F.abs(x))) / SQ8_LEVELS,
        )
        .select(
            "vec_id",
            F.transform(
                "v",
                lambda x: F.when(
                    F.col("scale") > 0, F.floor(x / F.col("scale") + 0.5)
                ).otherwise(F.lit(0)).cast("tinyint"),
            ).alias("q"),
            "scale",
        )
    )


def ann_sq8_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over the int8-quantized corpus. Cosine is
    invariant to each vector's uniform scale, so ranking on the quantized
    ints needs NO dequantization — the scale column never enters the
    score. Same plan as ann_brute_topk (broadcast queries, no corpus
    shuffle); the quantized corpus is 8× less IO/memory, which is the
    entire point at scale. Recall loss comes only from rounding and is
    measured by q_ann_recall_sq8, never asserted."""
    qz = quantize_sq8(emb, id_col=id_col, vec_col=vec_col).select(
        "vec_id",
        F.transform("q", lambda x: x.cast("double")).alias("embedding"),
    )
    return ann_brute_topk(qz, query_ids, k=k)


def ensure_brute_topk_fixture(
    spark,
    sf_dir: str,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact ground-truth top-k, MATERIALIZED once per (testdata
    generation, query set, k) under ``_artifacts/`` and read back as
    parquet afterwards — the offline-eval shape: recall measurement
    queries (q_ann_recall / _ivf / _sq8 share one truth set) should
    price only the approximate scan under test, not a fresh brute-force
    recompute per run (VERDICT r5 item 8). Cached via
    ``ensure_parquet_fixture``: the key's stat signature invalidates on
    testdata regeneration, and the params fold in the query set, k, and
    ``SIM_ROUND`` (the similarity rounding the stored truth bakes in)."""
    from ..sources.registry import ensure_parquet_fixture, load_table

    return ensure_parquet_fixture(
        spark, "ann_brute", sf_dir,
        params=("|".join(map(str, sorted(query_ids)))
                + f"|k={k}|{id_col}|{vec_col}|sim_dp={SIM_ROUND}"),
        build=lambda: ann_brute_topk(
            load_table(spark, sf_dir, "embeddings"),
            query_ids, k=k, id_col=id_col, vec_col=vec_col,
        ),
    )


def ann_ivf_recall_sweep(
    emb: DataFrame,
    query_ids: list[int],
    truth: DataFrame,
    k: int = 5,
    n_probes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    lists: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF recall@k at SEVERAL probe settings from ONE corpus scan —
    (query_id, n_true, recall_p{p}...) against exact ground truth.

    A scan at max(n_probes) covers every candidate any smaller setting
    would see; each candidate carries the rank of the probe that found
    it (probe_rank), so the n_probe=p top-k is the max-probe candidate
    set restricted to probe_rank <= p, ranked within that subset. The
    subset ranks all come out of ONE window pass: rows sorted once by
    (sim DESC, neighbor_id ASC), a conditional running count per
    setting (rows with probe_rank <= p seen so far) IS the subset
    row_number for subset members. The whole sweep is therefore one
    inverted-list scan + one window + one output-sized truth join —
    no per-setting plan branches to re-analyze or re-execute
    (predecessor ``ann_ivf_topk_multi`` fanned out a checkpointed
    candidate frame into three rankings and three recall joins).

    Pass ``centroids`` (label, centroid) to skip the centroid aggregate
    entirely — a stored IVF index keeps its coarse quantizer beside the
    lists (clustering.ensure_kmeans_centroids_fixture), so query time
    prices probe-select + list scan only. ``truth`` uses the shared
    (query_id, neighbor_id, ...) top-k contract (ann_brute_topk)."""
    p_max = max(n_probes)
    dim = infer_dim(emb, vec_col)
    vecs = _with_lists(emb, id_col, vec_col, list_col, lists).withColumn(
        "nv", _norm("v", dim)
    )
    if lists is not None and centroids is None:
        # Same pin as ann_ivf_topk: `vecs` fans out into the centroid
        # aggregate, the query-side probe, and the inverted-list scan —
        # a live k-means lineage would re-run once per consumer without
        # the cut. eager=False: defer the job to the first action.
        # SKIPPED when `centroids` is supplied: the stored-index path
        # (q_ann_recall_ivf) passes a parquet-backed assignment, where
        # re-reading columnar parquet per consumer beats materializing a
        # row-format checkpoint — the measurement query must price
        # probe-select + list scan, not a pointless materialization
        # (round-7 advice; the pre-fusion sweep exposed pin_lists=False
        # for exactly this).
        vecs = vecs.localCheckpoint(eager=False)
    cents = _centroids(vecs, dim) if centroids is None else centroids
    probes = _probe_select(vecs, query_ids, cents, p_max, id_col)
    sim = F.round(_cgn("qv", "v", "qn", "nv", dim), SIM_ROUND)
    scored = vecs.join(
        F.broadcast(probes),
        (F.col("label") == F.col("probe_label"))
        & (F.col(id_col) != F.col("query_id")),
    ).select("query_id", "probe_rank",
             F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    run_w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_top = [
        (
            (F.col("probe_rank") <= p)
            & (
                F.sum(
                    F.when(F.col("probe_rank") <= p, 1).otherwise(0)
                ).over(run_w)
                <= k
            )
        )
        .cast("int")
        .alias(f"in_p{p}")
        for p in n_probes
    ]
    hits = (
        scored.select("query_id", "neighbor_id", *in_top)
        # union of the per-setting top-k sets: <= |queries| x |settings| x k
        .filter(sum(F.col(f"in_p{p}") for p in n_probes) > 0)
    )
    recalls = [
        F.round(
            F.sum(F.coalesce(F.col(f"in_p{p}"), F.lit(0))) / F.count("*"),
            SIM_ROUND,
        ).alias(f"recall_p{p}")
        for p in n_probes
    ]
    return (
        truth.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_true"), *recalls)
        .orderBy("query_id")
    )
