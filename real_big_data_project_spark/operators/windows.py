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


def global_row_number(
    df: DataFrame,
    order: list,
    out_col: str = "rn",
    num_ranges: int = 32,
) -> DataFrame:
    """Exact global row_number over a TOTAL ordering without funneling the
    data through one task.

    ``Window.orderBy(...)`` with no partition moves every row to a single
    partition — the classic scale-killer (Spark itself warns). Instead:

      1. ``repartitionByRange`` + ``sortWithinPartitions`` on the ordering
         key — partition i holds a contiguous, locally sorted, globally
         ordered key range;
      2. partition id and local position stamped MAP-SIDE from
         ``monotonically_increasing_id`` (upper bits = partition index,
         lower 33 = position in partition order) — no second exchange, no
         window;
      3. the stamped frame is materialized ONCE via ``localCheckpoint``;
      4. exclusive prefix sums of the per-partition counts (one row per
         partition — aggregate-sized by design, same pattern as the
         sharded sequence-packing offsets) broadcast back.

    The checkpoint is load-bearing for CORRECTNESS, not a cache:
    ``repartitionByRange`` samples its cutpoints, so two plan branches
    that each re-evaluate it can land rows in DIFFERENT partitions (Spark
    documents the inconsistency; only exchange reuse normally hides it —
    with ``spark.sql.exchange.reuse=false`` the unmaterialized version
    produced wrong ranks for 87% of rows). Counts and positions must come
    from the SAME physical partitioning, so that partitioning is pinned
    to storage before the plan forks. The materialization is one extra
    write+read of the dataset — the same order of cost as the exchange
    itself, and the standard shape for position-stamping a shuffled
    corpus (you materialize the shards anyway).

    Global position = local position + partition base. Exact — not an
    approximation — provided ``order`` is a total (unique) ordering, the
    same contract every row_number in this repo carries (and partitions
    under 2^33 rows, far beyond any sane range size). The only
    single-partition structure is the ≤ ``num_ranges``-row offsets frame.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    parted = (
        df.repartitionByRange(num_ranges, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_gpid", F.shiftrightunsigned("_mid", 33))
        .withColumn(
            "_lrn", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + F.lit(1)
        )
        .drop("_mid")
        .localCheckpoint()
    )
    base_w = (
        Window.orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        parted.groupBy("_gpid").agg(F.count("*").alias("_n"))
        .withColumn("_base", F.coalesce(F.sum("_n").over(base_w), F.lit(0)))
        .select("_gpid", "_base")
    )
    return (
        parted.join(F.broadcast(bases), "_gpid")
        .withColumn(out_col, (F.col("_base") + F.col("_lrn")).cast("long"))
        .drop("_gpid", "_lrn", "_base")
    )


def global_running_sum(
    df: DataFrame,
    order: list,
    val_col: str,
    out_col: str = "running_sum",
    num_ranges: int = 32,
) -> DataFrame:
    """Exact INCLUSIVE global running sum of ``val_col`` over a TOTAL
    ordering without funneling the data through one task — the
    value-weighted sibling of ``global_row_number`` (same
    range-repartition + broadcast-prefix infra, same localCheckpoint
    against the cutpoint-resample hazard, same total-ordering
    contract).

      1. ``repartitionByRange`` on the ordering key pins contiguous
         global key ranges; ``spark_partition_id`` stamps them map-side;
      2. per-range inclusive window sums run in PARALLEL (the window
         partitions on the range id, never SinglePartition);
      3. the ≤ ``num_ranges`` per-range totals take an exclusive prefix
         sum on the aggregate-sized frame and broadcast back as bases.

    Used for budgeted corpus selection (take best docs until a token
    budget) and anywhere a cumulative quota over a global ranking is
    cut — the orderable-quota primitive sequence packing applies in
    id order (datapipe/corpus.py::pack_sequences).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    parted = (
        df.repartitionByRange(num_ranges, *cols)
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint()
    )
    local_w = (
        Window.partitionBy("_gpid").orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base_w = (
        Window.orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        parted.groupBy("_gpid").agg(F.sum(val_col).alias("_t"))
        .withColumn("_base", F.coalesce(F.sum("_t").over(base_w), F.lit(0)))
        .select("_gpid", "_base")
    )
    return (
        parted.withColumn("_lsum", F.sum(val_col).over(local_w))
        .join(F.broadcast(bases), "_gpid")
        .withColumn(out_col, F.col("_base") + F.col("_lsum"))
        .drop("_gpid", "_lsum", "_base")
    )


def exact_ntile(
    df: DataFrame,
    order: list,
    n_buckets: int,
    out_col: str = "bucket",
    num_ranges: int = 32,
) -> DataFrame:
    """SQL-exact NTILE(n) over a total ordering, built on
    ``global_row_number`` so no fact-sized data crosses a single task.

    Standard NTILE remainder semantics: with N rows and k buckets,
    q = N div k, r = N mod k — the first r buckets hold q+1 rows, the
    rest q. Closed form from the global rank, with N supplied by a
    broadcast one-row aggregate (scalar-subquery shape) over the ALREADY
    RANKED frame (N = max rank) — counting from ``df`` again would both
    re-scan the source and re-evaluate any nondeterministic lineage.
    """
    ranked = global_row_number(df, order, out_col="_grn",
                               num_ranges=num_ranges)
    total = ranked.agg(F.max("_grn").alias("_N"))
    # Pure integer arithmetic (`div`, never double division + ceil): with
    # double math a near-integer quotient can round down past 2^53-scale
    # ranks and misbucket a row. ceil(m / d) ≡ (m - 1) div d + 1 for
    # positive integers, exact at any rank.
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("_q", F.expr(f"_N div {n_buckets}"))
        .withColumn("_r", F.col("_N") % n_buckets)
        .withColumn("_cut", F.col("_r") * (F.col("_q") + 1))
        .withColumn(
            out_col,
            F.expr(
                "CASE WHEN _grn <= _cut THEN (_grn - 1) div (_q + 1) + 1 "
                "ELSE _r + (_grn - _cut - 1) div greatest(_q, 1) + 1 END"
            ).cast("int"),
        )
        .drop("_grn", "_N", "_q", "_r", "_cut")
    )


def gapfill_locf(
    bars: DataFrame,
    key: str,
    day_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Calendar gap-fill with last-observation-carried-forward — the
    TimescaleDB `time_bucket_gapfill(...) + locf(...)` feature of the
    reference's storage engine, and what its dashboard's client-side
    pandas resample actually needs (dashboard/timescaledb_model.py:558):
    every series gets one row per calendar day of ITS OWN [min, max]
    span; missing days are synthesized (`is_gap`) and carry the last
    observed values forward.

    Shape: the span aggregate is per-key (tiny), the calendar explode is
    bounded by the calendar not the tick count, and the forward fill is
    one per-key ordered window — a single shuffle on the series key.
    """
    span = bars.groupBy(key).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    cal = span.select(key, F.explode(F.sequence("_d0", "_d1")).alias(day_col))
    # presence marker, NOT value-NULL: a stored row whose value happens to
    # be NULL is a real observation, not a synthesized calendar gap
    # (review-found mislabel; LOCF still carries over its NULL).
    j = cal.join(
        bars.withColumn("_present", F.lit(True)), on=[key, day_col], how="left"
    )
    w = Window.partitionBy(key).orderBy(day_col)
    return j.select(
        key,
        day_col,
        F.col("_present").isNull().alias("is_gap"),
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )


def ewma(
    df: DataFrame,
    key: str,
    order_col: str,
    value: str,
    alpha: float = 0.1,
    window: int = 10,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per series:
    fold acc → acc·(1−α) + x·α over the last `window` ordered values,
    seeded with the window's first value. Truncation caps per-row work at
    O(window) — the exact running EWMA needs the full prefix, which is
    quadratic state in a collected-window formulation and
    order-dependent in any distributed reformulation; at (1−α)^window
    the discarded weight is documented and bounded (0.9¹⁰ ≈ 0.35 here —
    widen the window to tighten it).

    Pure fold arithmetic (no pow/exp — libm last-ulp hazards), identical
    left-to-right sequence in both engines → bit-exact against the
    DuckDB list_reduce oracle with no rounding.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    # double accumulator regardless of the input's numeric type — an
    # integer value column would otherwise make F.aggregate reject the
    # double-typed merge lambda at plan time
    lst = F.collect_list(F.col(value).cast("double")).over(w)
    folded = F.aggregate(
        F.slice(lst, 2, window),
        F.element_at(lst, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return df.select(key, order_col, value).withColumn("ewma", folded)


def longest_streaks(
    df: DataFrame,
    key: str,
    order_col: str,
    flag_col: str,
) -> DataFrame:
    """Gaps-and-islands: group consecutive flagged rows (in ``order_col``
    order per ``key``) into islands and report per-key streak stats —
    the classic difference-of-row-numbers rewrite (rn over all rows
    minus rn over flagged rows is constant within a consecutive run).
    Two partitioned window passes + two aggregates; nothing global.

    Returns (key, longest_streak, n_streaks, n_flagged).
    """
    rn_all = F.row_number().over(Window.partitionBy(key).orderBy(order_col))
    flagged = (
        df.withColumn("_rn", rn_all)
        .filter(F.col(flag_col))
        .withColumn(
            "_grp",
            F.col("_rn")
            - F.row_number().over(Window.partitionBy(key).orderBy(order_col)),
        )
    )
    streaks = flagged.groupBy(key, "_grp").agg(F.count("*").alias("_len"))
    return streaks.groupBy(key).agg(
        F.max("_len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
        F.sum("_len").cast("long").alias("n_flagged"),
    )
