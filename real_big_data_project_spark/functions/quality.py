"""Declarative data-quality expectations — the audited form of the
reference's ad-hoc cleanups (etl/etl.py:817-823 deletes negative/huge
values and orphaned FKs without ever counting what it destroyed).

An expectation is (name, boolean Column). `expectations_report` evaluates
ALL of them in ONE pass over the table — each becomes a
`sum(violation)` inside a single hash aggregate, so a 50-rule audit
costs exactly one scan at any scale (the map-side partials carry one
long per rule). Contrast a rule-per-query runner: 50 scans of 100 TB.

Gate with `require_clean` in pipelines: fail loudly BEFORE writing
downstream tables instead of silently deleting (the engine's quarantine
discipline — csv_source.read_nation_tsv_with_quarantine — applied to
semantic rules)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(
    df: DataFrame,
    expectations: list[tuple[str, Column]],
) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate) — one row per rule,
    computed in a single aggregate pass. A NULL predicate result counts
    as a violation (unknown is not clean); an EMPTY table is vacuously
    clean (rate 0). Rule names must be identifier-shaped — they become
    generated-SQL literals and column names."""
    import re

    if not expectations:
        raise ValueError("expectations must be a non-empty list")
    for name, _ in expectations:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"rule name {name!r} is not identifier-shaped "
                "([A-Za-z_][A-Za-z0-9_]*)"
            )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in expectations:
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', _v_{name}" for name, _ in expectations
    )
    return wide.selectExpr(
        f"stack({len(expectations)}, {stack}) AS (rule, n_violations)",
        "_n AS n_rows",
    ).select(
        "rule",
        "n_rows",
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("long")
        .alias("n_violations"),
        F.coalesce(
            F.round(F.col("n_violations") / F.col("n_rows"), 6), F.lit(0.0)
        ).alias("violation_rate"),
    )


def require_clean(
    df: DataFrame,
    expectations: list[tuple[str, Column]],
    max_rate: float = 0.0,
) -> None:
    """Raise ValueError naming every rule whose violation rate exceeds
    `max_rate`. The report is rule-count-sized — collecting it is
    metadata, not data."""
    bad = [
        (r.rule, r.n_violations, r.violation_rate)
        for r in expectations_report(df, expectations).collect()
        if r.violation_rate > max_rate
    ]
    if bad:
        detail = "; ".join(f"{n}: {v} rows ({rt:.4%})" for n, v, rt in bad)
        raise ValueError(f"data-quality expectations failed — {detail}")
