"""Physical layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A single-column sort gives parquet row-group min/max stats that prune
scans on THAT column only; predicates on a second column read everything.
Interleaving the bits of two columns into one sort key (the Z-order
curve) makes row groups cover small rectangles in (x, y) space, so
min/max stats prune on BOTH dimensions — the Delta/Iceberg
`OPTIMIZE ZORDER BY` layout, built from plain Spark expressions
(shift/and/or — whole-stage codegen, no UDF).

tests/test_sinks.py measures the effect on real parquet footers: after
`write_zordered`, the per-file value extents of BOTH columns shrink to a
fraction of their global range, where a linear sort leaves the second
column's extent at ~100%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_2d(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton key interleaving the low `bits` bits of two non-negative
    integer columns (x → even bit positions, y → odd). Static expression
    tree of 2·bits shift/mask/or terms — fully codegen'd."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("long")
    cy = (F.col(y) if isinstance(y, str) else y).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        bx = F.shiftright(cx, i).bitwiseAND(F.lit(1))
        by = F.shiftright(cy, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bx, 2 * i)).bitwiseOR(
            F.shiftleft(by, 2 * i + 1)
        )
    return key


def _minmax_scaled(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to the full [0, 2^bits) key width. Without
    this, columns of unequal range degenerate the curve toward a
    single-column sort (the wide column owns all the high bits) — the
    reason every ZORDER implementation rank- or range-normalizes first."""
    span = F.greatest(hi - lo, F.lit(1)).cast("double")
    return F.floor(
        (c - lo).cast("double") * ((1 << bits) - 1) / span
    ).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the (x, y) Z-order curve: min/max-scale
    both columns to the key width (one tiny agg, broadcast), interleave,
    range-partition on the Morton key (n_files ~contiguous curve
    segments), sort within each, drop the key. Readers need nothing
    special — row-group pruning on either column's min/max stats is
    automatic."""
    stats = df.agg(
        F.min(x).alias("_xlo"), F.max(x).alias("_xhi"),
        F.min(y).alias("_ylo"), F.max(y).alias("_yhi"),
    )
    zkey = zorder_key_2d(
        _minmax_scaled(F.col(x), F.col("_xlo"), F.col("_xhi"), bits),
        _minmax_scaled(F.col(y), F.col("_ylo"), F.col("_yhi"), bits),
        bits,
    )
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", zkey)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_xlo", "_xhi", "_ylo", "_yhi")
        .write.mode(mode)
        .parquet(path)
    )


def interleave_bits(normed: list[Column], bits: int = 12) -> Column:
    """n-dimensional Morton interleave: bit b of dimension i lands at
    position b·n_dims + i. Every bit is cast to LONG before shifting —
    int-typed shifts wrap at 32 positions (3 dims × 12 bits needs shift
    35), which silently corrupts the key. Generalizes zorder_key_2d."""
    d = len(normed)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(normed):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i))
    return z


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    out_col: str = "z",
) -> DataFrame:
    """Append the n-dim z-value of `cols` (numeric columns): each column
    min/max-scaled into the shared [0, 2^bits) budget (_minmax_scaled —
    the degeneracy guard), then Morton-interleaved. The bounds aggregate
    is 1 row, broadcast back; the key is pure codegen bit arithmetic."""
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"_zlo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"_zhi_{c}") for c in cols],
    )
    j = df.crossJoin(F.broadcast(bounds))
    normed = [
        _minmax_scaled(
            F.col(c), F.col(f"_zlo_{c}"), F.col(f"_zhi_{c}"), bits
        )
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
    bits: int = 12,
) -> None:
    """n-dim companion of write_zordered: range repartition on the
    normalized Morton key, sort within partitions, drop the key."""
    (
        with_zvalue(df, cols, bits)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
