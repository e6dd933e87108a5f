"""Vector expressions over array<float|double> embedding columns.

Built on higher-order functions (zip_with / aggregate / transform) — these
run JVM-side with no Python round-trip, which is what makes brute-force
similarity viable as a baseline at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def cosine_given_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """``cosine`` with both norms precomputed as columns. The plain
    ``cosine`` expression folds each array THREE times per evaluation
    (dot + each norm in both the zero-guard and the value — interpreted
    HOF folds get no common-subexpression elimination), so a pair join
    pays five folds per candidate pair. Attaching ``norm(v)`` to each
    side ONCE (corpus-sized, one fold per row) drops per-pair work to
    the single dot fold — measured 5x on the SemDeDup within-cluster
    scoring at sf0.1. Bit-identical: the norm column carries the exact
    same double the inline subtree would produce."""
    na, nb = _c(na), _c(nb)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """``dot`` with the fold UNROLLED over a known dimension.

    Bit-identical to ``dot``: the accumulation is the same left-to-right
    sequence ``((0.0 + a₀·b₀) + a₁·b₁) + …`` the HOF fold performs. The
    difference is execution: higher-order functions are CodegenFallback
    (interpreted, per row), while the unrolled expression participates
    in whole-stage codegen — on candidate-heavy plans that evaluate the
    fold billions of times (k-means assignment at k=4096 over the 2M
    organic sf100 embeddings evaluates 8.2e9 of them) the interpreted
    evaluator IS the plan cost. Use when the embedding dimension is
    known (infer_dim); fall back to ``dot`` otherwise.

    Plain-string inputs take the ONE-CALL ``F.expr`` path: building the
    64-term tree Column-by-Column costs ~260 py4j round trips (~0.7 s
    measured on this box) per instantiation, and the SemDeDup builder
    instantiates eight such trees — the round-11 profiler measured the
    datapipe family spending more wall in plan CONSTRUCTION than in
    execution at sf0.1. The parsed tree is identical node-for-node
    (verified on the analyzed plan), so results are bit-equal."""
    if isinstance(a, str) and isinstance(b, str):
        terms = "".join(f" + (`{a}`[{i}] * `{b}`[{i}])" for i in range(dim))
        return F.expr(f"0.0D{terms}")
    ca, cb = _c(a), _c(b)
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + ca[i] * cb[i]
    return acc


def norm_fixed(a: Column | str, dim: int) -> Column:
    """``norm`` with the fold unrolled — same sequential accumulation
    order, codegen instead of the interpreted HOF evaluator. String
    inputs parse as one ``F.expr`` (see dot_fixed — construction cost)."""
    if isinstance(a, str):
        terms = "".join(f" + (`{a}`[{i}] * `{a}`[{i}])" for i in range(dim))
        return F.expr(f"SQRT(0.0D{terms})")
    ca = _c(a)
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + ca[i] * ca[i]
    return F.sqrt(acc)


def cosine_given_norms_fixed(
    a: Column | str, b: Column | str,
    na: Column | str, nb: Column | str, dim: int,
) -> Column:
    """``cosine_given_norms`` with the dot fold unrolled (codegen)."""
    na, nb = _c(na), _c(nb)
    return F.when((na > 0) & (nb > 0), dot_fixed(a, b, dim) / (na * nb))


def infer_dim(df, vec_col: Column | str) -> int | None:
    """Embedding dimension from the first row (one LIMIT-1 job; None on
    an empty frame). Metadata-sized by construction — the cost of ONE
    row against plans whose hot loop runs millions to billions of fold
    evaluations; callers keep the HOF path when this returns None."""
    row = df.select(F.size(_c(vec_col)).alias("_d")).head()
    return None if row is None else int(row["_d"])


def sign_bucket(a: Column | str, dims: list[int]) -> Column:
    """Deterministic LSH-ish bucket: concatenated sign bits of fixed
    dimensions. Cheap, portable to SQL (the oracle reproduces it), and a
    real candidate-pruning strategy for near-duplicate detection — recall
    is bounded but deterministic."""
    if isinstance(a, str):
        bits_sql = ", ".join(
            f"CASE WHEN element_at(`{a}`, {d + 1}) >= 0 THEN '1' ELSE '0' END"
            for d in dims
        )
        return F.expr(f"concat({bits_sql})")
    c = _c(a)
    bits = [
        F.when(F.element_at(c, d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)
