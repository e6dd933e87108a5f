"""Window operators (SURVEY.md §2.7 W-series).

All windows partition by the series key — on a cluster each series'
history lands in one task; skewed series are handled by AQE. No python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleansing import pct_change


def lag_pct_change(
    df: DataFrame,
    key: str = "cid",
    ts: str = "date",
    price: str = "value",
) -> DataFrame:
    """W1/F9 — previous value + pct change per series (etl/etl.py:382-390).

    pandas `groupby().shift(1)` ≡ `lag(1)` over (key ORDER BY ts); the
    reference's stable mergesort is replaced by a total ordering key
    (ts is unique per key in our feeds; callers must guarantee it).
    """
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(price, 1).over(w)
    return (
        df.withColumn("prev_value", prev)
        .withColumn("pct_change", pct_change(F.col(price), prev))
    )


def rolling_bollinger(
    df: DataFrame,
    key: str = "cid",
    ts: str = "date",
    price: str = "value",
    window_size: int = 20,
    num_std: float = 2.0,
) -> DataFrame:
    """W2 — rolling mean/std + Bollinger bands (dashboard/tabs/tab1.py:15-21).

    pandas `rolling(w)` yields NULL until w observations exist; emulate by
    guarding the frame with a running count (SURVEY.md §7 risk register) so
    a DuckDB oracle with the same guard agrees bit-for-bit (after rounding).
    """
    w = Window.partitionBy(key).orderBy(ts).rowsBetween(-(window_size - 1), 0)
    cnt = F.count(price).over(w)
    mean = F.avg(price).over(w)
    std = F.stddev_samp(price).over(w)
    full = cnt >= window_size
    return (
        df.withColumn("boll_mean", F.when(full, mean))
        .withColumn("boll_std", F.when(full, std))
        .withColumn("boll_upper", F.when(full, mean + num_std * std))
        .withColumn("boll_lower", F.when(full, mean - num_std * std))
    )


def first_last_per_group(
    df: DataFrame,
    keys: list[str],
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """D3/W3 — first and last row per group via row_number over a total
    ordering (etl/etl.py:399-404). Returns the input rows flagged
    `is_first` / `is_last`."""
    asc = Window.partitionBy(*keys).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    desc = Window.partitionBy(*keys).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return (
        df.withColumn("is_first", F.row_number().over(asc) == 1)
        .withColumn("is_last", F.row_number().over(desc) == 1)
    )
