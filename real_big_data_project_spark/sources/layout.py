"""Z-order data layout: multi-dimensional clustering for file/row-group
pruning.

A single-column sort (sinks.write_time_partitioned's `(key, ts)` layout —
the reference's `(cid, date DESC)` index analogue) gives perfect min/max
pruning on that column and NONE on any other. Z-ordering interleaves the
bits of several columns into one sort key so every file holds a small
hyper-rectangle of the key space: predicates on ANY of the z-columns —
alone or boxed — prune via plain parquet min/max stats, no new reader
machinery. This is the standard lakehouse answer to "we filter ticks by
series AND by date, but can only sort by one".

Two details that decide whether z-ordering works at all:

  * **Normalize each dimension into the same bit budget first.** Raw
    values with unequal magnitudes (a 5-bit day next to an 11-bit user
    id) make the wide column's high bits dominate the interleave and the
    layout silently degenerates to a single-column sort — measured on
    this corpus: unnormalized z pruned day-predicates 32/32 files
    (nothing), normalized z prunes both dimensions to ≲ 1/3 of files
    (tests/test_sinks.py pins it).
  * **The per-column min/max bounds are a stats-sized aggregate**, kept
    distributed here (1-row broadcast joined back in); at 100 TB they
    come from table metadata for free.

Write path = one range repartition on z + in-partition sort — the same
cost as any clustering rewrite; re-run it per partition as data arrives
(compact_partitions composes with it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 12  # per-dimension resolution; 2 dims × 12 bits fits a long easily


def interleave_bits(normed: list[Column], bits: int = Z_BITS) -> Column:
    """Morton interleave: bit b of dimension i lands at position
    b * n_dims + i. Pure codegen'd bit arithmetic — no UDF."""
    d = len(normed)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(normed):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i).cast("long"))
    return z


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = Z_BITS,
    out_col: str = "z",
) -> DataFrame:
    """Append the z-value of `cols` (integer-valued columns). Each column
    is min/max-normalized into [0, 2^bits) — floor((x - lo) * M / span) —
    before interleaving; the bounds aggregate is 1 row, broadcast back."""
    m = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"_zlo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_zhi_{c}") for c in cols],
    )
    j = df.crossJoin(F.broadcast(bounds))
    normed = [
        F.floor(
            (F.col(c).cast("long") - F.col(f"_zlo_{c}")) * m
            / F.greatest(F.col(f"_zhi_{c}") - F.col(f"_zlo_{c}"), F.lit(1))
        ).cast("int")
        for c in cols
    ]
    return j.withColumn(out_col, interleave_bits(normed, bits)).drop(
        *[f"_zlo_{c}" for c in cols], *[f"_zhi_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = Z_BITS,
) -> None:
    """Rewrite `df` as `n_files` z-clustered parquet files: range
    repartition on z (one shuffle), sort within partitions, drop the key.
    Min/max stats on every z-column then prune files for single-column
    and box predicates alike."""
    (
        with_zvalue(df, cols, bits)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
