"""Distributed linear-model training (batch gradient descent) — the
second iterative algorithm in the engine, alongside clustering.py's
k-means, and the template for every broadcast-parameter optimization
(quality regressors/classifiers over corpus features).

Pattern per iteration (the distributed-ML training shape):
  * the parameter vector is TINY (k weights) and BROADCAST — the corpus
    never shuffles;
  * per-row gradient contributions are pure codegen arithmetic;
  * ONE hash aggregate (map-side partials) reduces them to k numbers;
  * the update runs on the 1×1 joined result — no collect, the whole
    training loop is a single lazy plan.

Determinism contract (what makes a float iteration oracle-checkable,
same as clustering.py): gradients and weights are ROUNDED to
`GRAD_ROUND` dp after every aggregate, so the next iteration's inputs
are bit-identical in both engines regardless of their float-summation
order. Squared loss only — no exp/log links, whose libm implementations
differ across engines in the last ulp.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAD_ROUND = 6


def _dot_wx(k: int) -> Column:
    """w·x as a LEFT-ASSOCIATED sum — the association order is part of
    the determinism contract (the oracle SQL writes the same chain, so
    both engines run the identical IEEE-double op sequence per row)."""
    return reduce(
        lambda a, b: a + b,
        [F.col(f"w{i}") * F.col(f"x{i}") for i in range(k)],
    )


def _gd_trace(
    df: DataFrame,
    feature_cols: list[Column | str],
    label_col: Column | str,
    lr: float,
    iters: int,
    loss_grads,
    metric: str,
) -> DataFrame:
    """Shared broadcast-parameter GD scaffold (see linreg_gd's docstring
    for the distributed shape and the per-iteration checkpoint
    rationale). ``loss_grads(k) -> (grad_exprs, metric_expr)`` supplies
    the model: k per-feature gradient columns plus the reported loss,
    all evaluated on the (features × broadcast-weights) frame.
    """
    feats = [F.col(c) if isinstance(c, str) else c for c in feature_cols]
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    k = len(feats)
    base = df.select(
        *[f.cast("double").alias(f"x{j}") for j, f in enumerate(feats)],
        y.cast("double").alias("y"),
    )
    # seed from range(1), not limit(1)-of-the-corpus: the all-literal
    # zero row should not depend on a corpus scan, and an empty input
    # then yields a trace of NULL gradients instead of silently no rows
    w = df.sparkSession.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(k)]
    )
    rows = []
    for t in range(1, iters + 1):
        j = base.crossJoin(F.broadcast(w))
        grad_exprs, metric_expr = loss_grads(k)
        stats = j.agg(
            *[
                F.round(F.avg(g), GRAD_ROUND).alias(f"g{i}")
                for i, g in enumerate(grad_exprs)
            ],
            F.round(F.avg(metric_expr), GRAD_ROUND).alias(metric),
        )
        w_next = w.crossJoin(F.broadcast(stats)).select(
            *[
                F.round(F.col(f"w{i}") - lr * F.col(f"g{i}"), GRAD_ROUND).alias(f"w{i}")
                for i in range(k)
            ]
        )
        # Pin the 1-row (weights, mse) lineage each iteration: without
        # this, iteration t's lazy plan nests t aggregates over the full
        # corpus and BOTH planning time and execution re-work grow
        # quadratically in the iteration count (the same hazard
        # clustering.py sidesteps by keeping n_assign small). One tiny
        # eager job per iteration buys a flat O(T) training loop.
        step = (
            w_next.crossJoin(stats.select(metric))
            .localCheckpoint(eager=True)
        )
        rows.append(
            step.select(
                F.lit(t).alias("iteration"),
                *[f"w{i}" for i in range(k)],
                metric,
            )
        )
        w = step.select(*[f"w{i}" for i in range(k)])
    return reduce(lambda a, b: a.unionByName(b), rows)


def linreg_gd(
    df: DataFrame,
    feature_cols: list[Column | str],
    label_col: Column | str,
    lr: float = 0.1,
    iters: int = 3,
) -> DataFrame:
    """Train y ≈ w·x by full-batch GD (squared loss, implicit intercept
    NOT added — pass a literal 1.0 feature for one). Returns the
    per-iteration trace (iteration, w0..wk, mse) — mse is measured with
    the weights BEFORE that iteration's update, so iteration 1's mse is
    the zero-weight baseline.
    """
    def loss_grads(k: int):
        err = _dot_wx(k) - F.col("y")
        return [2.0 * err * F.col(f"x{i}") for i in range(k)], err * err

    return _gd_trace(df, feature_cols, label_col, lr, iters,
                     loss_grads, metric="mse")


def svm_gd(
    df: DataFrame,
    feature_cols: list[Column | str],
    label_col: Column | str,
    lr: float = 0.1,
    iters: int = 3,
) -> DataFrame:
    """Linear SVM classifier by full-batch subgradient descent on the
    (unregularized) hinge loss — the quality-CLASSIFIER counterpart to
    linreg_gd's regressor, and the fastText-style shape data-curation
    pipelines train to score documents.

    ``label_col`` must be ±1. Per row: margin = y·(w·x); rows with
    margin < 1 contribute subgradient −y·x, others 0; the reported
    metric is avg(max(0, 1 − margin)). Hinge is chosen over the
    logistic link DELIBERATELY: it is exp/log-free (CASE + multiply
    only), so the trace stays bit-reproducible across engines — libm's
    exp differs in the last ulp between DuckDB and the JVM, which would
    break the rounded-trace oracle contract (module docstring).
    Margin-boundary rows (margin exactly 1) are measure-zero with
    real-valued features and excluded from the active set in BOTH
    engines by the identical ``< 1`` comparison on identical doubles.
    """
    def loss_grads(k: int):
        margin = F.col("y") * _dot_wx(k)
        active = margin < 1.0
        grads = [
            F.when(active, -F.col("y") * F.col(f"x{i}")).otherwise(F.lit(0.0))
            for i in range(k)
        ]
        loss = F.when(active, 1.0 - margin).otherwise(F.lit(0.0))
        return grads, loss

    return _gd_trace(df, feature_cols, label_col, lr, iters,
                     loss_grads, metric="hinge")
