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
        err = reduce(
            lambda a, b: a + b,
            [F.col(f"w{i}") * F.col(f"x{i}") for i in range(k)],
        ) - F.col("y")
        stats = j.agg(
            *[
                F.round(F.avg(2.0 * err * F.col(f"x{i}")), GRAD_ROUND).alias(f"g{i}")
                for i in range(k)
            ],
            F.round(F.avg(err * err), GRAD_ROUND).alias("mse"),
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
            w_next.crossJoin(stats.select("mse"))
            .localCheckpoint(eager=True)
        )
        rows.append(
            step.select(
                F.lit(t).alias("iteration"),
                *[f"w{i}" for i in range(k)],
                "mse",
            )
        )
        w = step.select(*[f"w{i}" for i in range(k)])
    return reduce(lambda a, b: a.unionByName(b), rows)
