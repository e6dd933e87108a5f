"""Incremental materialized-aggregate refresh (the continuous-aggregate /
hypertable-rollup maintenance pattern).

The reference maintains its daily bars INCREMENTALLY: each processed date
appends one aggregated batch to ``daystocks`` (etl/etl.py:342-361
``process_daystocks``) on top of a TimescaleDB hypertable chunked by the
time column (etl/timescaledb_model.py:159-169,:281-283). TimescaleDB's
continuous aggregates generalize that to "re-aggregate only the chunks a
new batch touched". This module is the Spark restatement:

  * the raw tick store is date-partitioned parquet (sinks.py's hypertable
    analogue), so "re-aggregate the touched days" is a partition-pruned
    scan, not a full-table pass;
  * the affected-day set comes from the batch itself (distinct days — a
    handful of rows), broadcast into both the refresh scan (dynamic
    partition pruning) and the merge anti-join;
  * merge = stored bars for untouched days ∪ freshly aggregated bars for
    touched days. No shuffle touches the untouched majority: the anti
    join broadcasts the tiny day set.

At 100 TB this is THE difference between "the nightly rollup reads 100 TB"
and "it reads the 3 late partitions": cost scales with the increment, not
the corpus, while the result is bit-equal to a full recompute (which is
exactly what the DuckDB oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def affected_days(batch: DataFrame, day_col: str) -> DataFrame:
    """Distinct days a batch touches — the invalidation set. Metadata-sized
    by construction (bounded by the calendar, not the row count)."""
    return batch.select(F.col(day_col).cast("date").alias(day_col)).distinct()


def incremental_refresh(
    stored: DataFrame,
    refreshed: DataFrame,
    days: DataFrame,
    day_col: str,
) -> DataFrame:
    """Merge a stored aggregate with freshly recomputed rows for the
    affected days: stored rows for untouched days survive verbatim, every
    touched day is served from the recompute. ``days`` is broadcast — the
    stored side is never shuffled."""
    keep = stored.join(F.broadcast(days), on=day_col, how="left_anti")
    return keep.unionByName(refreshed.select(*keep.columns))
