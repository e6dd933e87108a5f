"""Join operators (SURVEY.md §2.5 J-series) + surrogate key generation (A7).

Design for scale: dimension sides are explicitly `F.broadcast(...)`-hinted
(the reference's python dict caches *are* broadcast hash joins,
etl/etl.py:118-133); fact-to-fact joins are left to Catalyst/AQE which
picks sort-merge with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    take: dict[str, str],
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """J1/J2 — map fact columns through a small dimension with defaults for
    misses (etl/etl.py:125-133, :326-328): left broadcast join + coalesce.

    `take` maps dim column → output alias; `defaults` supplies the miss
    value per output alias.
    """
    defaults = defaults or {}
    dim_sel = dim.select(F.col(on), *[F.col(c).alias(a) for c, a in take.items()])
    out = facts.join(F.broadcast(dim_sel), on=on, how="left")
    for _, alias in take.items():
        if alias in defaults:
            out = out.withColumn(alias, F.coalesce(F.col(alias), F.lit(defaults[alias])))
    return out


def anti_join_new_keys(incoming: DataFrame, existing: DataFrame, on: list[str]) -> DataFrame:
    """J4/J5 — keep only rows whose key does not yet exist
    (etl/etl.py:282-290, :426-434). The reference's python set-difference is
    exactly a left_anti join."""
    return incoming.join(existing.select(*on).distinct(), on=on, how="left_anti")


def semi_join_keep_matched(facts: DataFrame, dim: DataFrame, fact_key: str, dim_key: str) -> DataFrame:
    """J6 — orphan removal `DELETE … WHERE cid NOT IN (SELECT id …)`
    (etl/etl.py:823) expressed as the rows we KEEP (left_semi)."""
    return facts.join(
        dim.withColumnRenamed(dim_key, fact_key).select(fact_key),
        on=fact_key,
        how="left_semi",
    )


def surrogate_keys(
    new_rows: DataFrame,
    existing: DataFrame | None,
    id_col: str,
    order: list,
) -> DataFrame:
    """A7 — dense deterministic surrogate ids: max(existing id) + row_number
    over a stable total ordering (etl/etl.py:292-299).

    `monotonically_increasing_id` is deliberately NOT used — it is neither
    dense nor reproducible across partitionings. The single-row max
    aggregate broadcasts via a cross join (scalar subquery shape).
    """
    base = (
        existing.agg(F.coalesce(F.max(id_col), F.lit(0)).alias("_base"))
        if existing is not None
        else None
    )
    # Global row_number: the ordering window has no partition, which funnels
    # the NEW rows (only) through one task. Dimensions are small by
    # construction (dense int32 id space); never use this on a fact table.
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order])
    numbered = new_rows.withColumn("_rn", F.row_number().over(w))
    if base is not None:
        numbered = numbered.crossJoin(F.broadcast(base)).withColumn(
            id_col, (F.col("_base") + F.col("_rn")).cast("int")
        ).drop("_base")
    else:
        numbered = numbered.withColumn(id_col, F.col("_rn").cast("int"))
    return numbered.drop("_rn")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_values: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of (backward, inclusive) join: for every left row, the latest
    right row of the same `key` with right.ts <= left.ts; NULLs when no
    prior right row exists (LEFT semantics).

    Not in the reference (SURVEY §2.5 notes its absence) but the canonical
    financial operator its tick model implies (trade ⟕ latest quote).

    Spark has no ASOF JOIN; a range-join would explode. This is the
    scalable restatement: tag + UNION both inputs, one window pass
    carrying the last non-null right payload over (key ORDER BY ts,
    right-before-left, tiebreak), then keep the left rows — exactly ONE
    shuffle on `key`, linear in |L|+|R|, skew handled by AQE. Right rows
    sort before left rows at equal ts, which yields the inclusive
    backward semantics (matching e.g. DuckDB's ASOF JOIN with >=).
    """
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_values])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    l_tag = left.withColumn("_src", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(payload_type)
    )
    # build the payload struct BEFORE projecting right down to (key, ts) —
    # the projection nulls out left-named columns the struct may reference
    r_tag = right.withColumn("_payload", payload).select(
        F.col(key), F.col(ts),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c not in (key, ts)],
        F.lit(0).alias("_src"),
        "_payload",
    )
    both = l_tag.select(*lcols, "_src", "_payload").unionByName(
        r_tag.select(*lcols, "_src", "_payload")
    )
    # Ordering must be total on BOTH sides. `tiebreak` is a left column
    # (NULL on right rows), so right rows carrying duplicate (key, ts)
    # additionally order by their payload struct — deterministic
    # max-payload-wins instead of an arbitrary partitioning-dependent
    # winner. Left rows all have NULL payload, so this term is inert for
    # them and their `tiebreak` decides.
    order = [F.col(ts).asc(), F.col("_src").asc(),
             F.col("_payload").asc_nulls_first()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(key).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_payload", ignorenulls=True).over(w)
    out = (
        both.withColumn("_carried", carried)
        .filter(F.col("_src") == 1)
        .drop("_src", "_payload")
    )
    for c in right_values:
        out = out.withColumn(f"asof_{c}", F.col("_carried")[c])
    return out.drop("_carried")


def interval_join_binned(
    probe: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Containment join — probe rows whose `ts` falls in [start, end] of an
    interval — WITHOUT an equi key (the case Spark plans as a cartesian
    BroadcastNestedLoopJoin, which dies when neither side is small).

    Bin-bucketing restatement: explode every interval into the day bins it
    covers; bin the probe timestamp; EQUI-join on the bin; keep the exact
    BETWEEN predicate as a post-filter. Each probe row lands in exactly one
    bin and an interval is present in every bin it spans, so each
    qualifying (probe, interval) pair matches exactly once — no dedup
    needed.

    Scale shape: one hash shuffle on the bin key instead of |probe| ×
    |intervals| comparisons; interval replication = interval length in
    days (bounded, known up front). Bin-key skew (a hot day) is AQE
    skew-split territory. With `broadcast_intervals` the shuffle
    disappears entirely — right for dimension-sized interval sets.
    DuckDB's IEJoin answers the same query directly, which makes this
    oracle-checkable.
    """
    # An inverted interval (end < start) can never satisfy the BETWEEN —
    # drop it up front instead of letting sequence() throw on a negative
    # range (exact equivalence with the naive cross-join formulation).
    binned_iv = intervals.filter(F.col(end) >= F.col(start)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.col(start)),
                F.date_trunc("DAY", F.col(end)),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    if broadcast_intervals:
        binned_iv = F.broadcast(binned_iv)
    binned_probe = probe.withColumn("_bin", F.date_trunc("DAY", F.col(ts)))
    return (
        binned_probe.join(binned_iv, on="_bin", how="inner")
        .filter(F.col(ts).between(F.col(start), F.col(end)))
        .drop("_bin")
    )


def resolve_identity(
    incoming: DataFrame,
    existing: DataFrame,
    natural_key: str,
    id_col: str,
    update_cols: list[str],
) -> DataFrame:
    """J3 — identity resolution on a natural key (ISIN, etl/etl.py:272-280):
    rows whose `natural_key` already exists adopt the existing id and their
    fresh attribute values win (the reference pushes UPDATEs back).

    Returns the resolved rows (known ids only); pair with
    `anti_join_new_keys` + `surrogate_keys` for the full dimension flow.
    """
    ex = existing.select(natural_key, F.col(id_col).alias("_existing_id"))
    resolved = (
        incoming.join(F.broadcast(ex), on=natural_key, how="inner")
        .withColumn(id_col, F.col("_existing_id"))
        .drop("_existing_id")
    )
    return resolved.select(id_col, natural_key, *update_cols)
