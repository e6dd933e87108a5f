"""Skew-handling aggregation (the 100 TB posture for hot keys).

AQE's skew-join splitting covers joins, but a groupBy on a power-law key
(one user/symbol with 100M ticks) still funnels each hot key through one
reducer. Classic fix: SALTED TWO-PHASE aggregation — partial-aggregate on
(key, salt), then merge partials per key. Works for any algebraic
aggregate (sum/count/min/max and their compositions).

salt_partitions trades one extra (tiny) shuffle for bounded reducer fan-in
— the partial shuffle spreads each hot key over N reducers. For aggregates
Spark already does map-side partial aggregation, which usually suffices;
salting matters when the DISTINCT key count is small relative to
executors (partials still collide on the same reducer) — exactly the
hot-symbol case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """sum/count/min/max of `value` per `keys`, salted two-phase.

    Phase 1 shuffles on (keys, salt) — each hot key spread over n_salts
    reducers; phase 2 merges the ≤ n_salts partials per key (tiny).
    Result is exactly groupBy(keys).agg(sum, count, min, max).
    """
    # Deterministic per-row salt: hash of key + value columns. NEVER a
    # nondeterministic source (monotonically_increasing_id / rand): under
    # task retry those re-evaluate differently, re-routing rows across
    # already-consumed reduce partitions → double-counted or lost rows.
    # Duplicate rows share a salt (slightly less spreading), which is
    # harmless for correctness.
    salt = (F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.col(value)),
        F.lit(n_salts),
    )).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value).alias("_s"),
            F.count(value).alias("_c"),
            F.min(value).alias("_mn"),
            F.max(value).alias("_mx"),
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_s").alias("sum_value"),
            F.sum("_c").alias("count_value"),
            F.min("_mn").alias("min_value"),
            F.max("_mx").alias("max_value"),
        )
    )


def with_salt(row_unique_col: Column, n_salts: int) -> Column:
    """Deterministic row salt for pre-spreading a skewed join key: append
    to the join key on the BIG side, explode 0..n-1 on the small side.

    `row_unique_col` must vary PER ROW (an event id, a line number —
    never the join key itself: hashing the key gives every row of a hot
    key the same salt, which spreads nothing)."""
    return F.pmod(F.xxhash64(row_unique_col), F.lit(n_salts))


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    big_row_unique: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a skew-salted key: each big-side row gets a
    deterministic salt from its row-unique column; the small side is
    exploded across all salts so every (key, salt) pair still matches.
    The shuffle key becomes (key, salt) — a hot key spreads over n_salts
    reducers at the cost of replicating the small side n_salts×.

    Use when AQE's skew-join splitting isn't available (e.g. the join
    feeds an operator that pins partitioning) or the small side is too
    big to broadcast but cheap to replicate. Result equals
    big.join(small, on, how) exactly (tested) — for the supported `how`
    values only: right/full outer would emit each unmatched small-side
    row once per salt (the small side is exploded n_salts×), so those
    modes are rejected rather than silently wrong."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_equi_join does not support how={how!r}: unmatched "
            "small-side rows would be duplicated per salt; use a plain "
            "join (or AQE skew handling) for right/full outer joins"
        )
    b = big.withColumn("_salt", with_salt(F.col(big_row_unique), n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")
