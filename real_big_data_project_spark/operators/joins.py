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
    # construction (int16 id space); never use this on a fact table.
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order])
    numbered = new_rows.withColumn("_rn", F.row_number().over(w))
    if base is not None:
        numbered = numbered.crossJoin(F.broadcast(base)).withColumn(
            id_col, (F.col("_base") + F.col("_rn")).cast("int")
        ).drop("_base")
    else:
        numbered = numbered.withColumn(id_col, F.col("_rn").cast("int"))
    return numbered.drop("_rn")


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
