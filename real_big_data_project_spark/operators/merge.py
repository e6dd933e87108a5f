"""MERGE / CDC-apply (SCD1 upsert): apply a change log to a snapshot.

The reference mutates rows in place — per-row ``UPDATE companies SET …``
on key conflicts (etl/etl.py:279) and ``DELETE FROM stocks WHERE …``
cleanups (etl/etl.py:817-823). Parquet is immutable, so the Spark
restatement is the standard lakehouse MERGE: resolve the change log to
one winning row per key, then rewrite the snapshot through one
full-outer join that keeps / replaces / deletes / inserts.

Scale posture (100 TB snapshot, ≪ change batch):

  * the log resolve is ONE max_by hash-aggregate on the (small) change
    side — no window, map-side partial agg;
  * the merge join shuffles on the key; with the snapshot stored
    BUCKETED on the key (sinks.write_bucketed), only the change side
    moves, and with day-partitioned snapshots the join can be restricted
    to affected partitions first (operators/incremental.py's pattern);
  * nothing here collects, and the rewrite is a straight columnar
    select — whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_change_log(
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Last-write-wins per key over an append-only change log: the single
    max_by aggregate keeps the row with the highest (seq, op, …payload) —
    the same resolve shape as sources/tags.py. The FULL payload joins the
    ordering as the final tiebreak so even pathological logs carrying the
    same (seq, op) twice with different values resolve deterministically
    (hypothesis-found: a bare (seq, op) key lets max_by pick either)."""
    payload = [c for c in changes.columns if c != key]
    rest = [c for c in payload if c not in (seq_col, op_col)]
    order = F.struct(seq_col, op_col, *rest)
    return (
        changes.groupBy(key)
        .agg(F.max_by(F.struct(*payload), order).alias("_w"))
        .select(key, "_w.*")
    )


def merge_upsert(
    snapshot: DataFrame,
    resolved: DataFrame,
    key: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply resolved changes: unmatched snapshot rows survive, matched
    rows take the change's values ('U'), keys only in the change side are
    inserted ('I'), and `delete_op` rows drop. Change rows must carry the
    FULL value row (SCD1 whole-row semantics, like the reference's
    UPDATE … SET name, symbol)."""
    value_cols = [c for c in snapshot.columns if c != key]
    j = snapshot.alias("_s").join(resolved.alias("_c"), on=key, how="full_outer")
    changed = F.col(op_col).isNotNull()
    return j.filter(F.col(op_col).isNull() | (F.col(op_col) != delete_op)).select(
        key,
        *[
            F.when(changed, F.col(f"_c.{v}")).otherwise(F.col(f"_s.{v}")).alias(v)
            for v in value_cols
        ],
    )
