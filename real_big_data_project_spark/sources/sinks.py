"""Sinks (SURVEY.md §2.1 S6/S9): the engine's storage substrate.

The reference bulk-loads via ``COPY FROM STDIN`` into TimescaleDB
hypertables chunked on the date column (etl/timescaledb_model.py:29-57,
:281-283). The Spark restatement is date-partitioned Parquet:

  * ``partitionBy(day)`` reproduces hypertable time-chunking — query-side
    date predicates become partition pruning (directories skipped before
    any IO), verified by tests/test_sinks.py;
  * ``sortWithinPartitions(key, ts)`` approximates the reference's
    ``(cid, date DESC)`` index: parquet row-group min/max stats on a
    sorted layout give per-series range scans most of an index's benefit;
  * the writer commits per task — the reference's 100k-row commit
    batching (etl/etl.py:617) has no analogue because it exists only to
    bound single-process memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "day"


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts: str = "date",
    key: str = "cid",
    mode: str = "overwrite",
) -> None:
    """Write a tick/bar table as date-partitioned parquet, sorted by
    (key, ts) within each partition (S6 + the hypertable/index analogue)."""
    (
        df.withColumn(PARTITION_COL, F.col(ts).cast("date"))
        .repartition(F.col(PARTITION_COL))
        .sortWithinPartitions(key, ts)
        .write.partitionBy(PARTITION_COL)
        .mode(mode)
        .parquet(path)
    )


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan back; date predicates on PARTITION_COL prune directories."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a managed parquet table hash-bucketed on `key` (optionally
    sorted within buckets).

    Bucketing is the join-side half of the scale story that partitioning
    (time pruning) doesn't cover: two tables bucketed on the same key with
    the same bucket count join WITHOUT any Exchange — the shuffle is paid
    once at write time, then every subsequent co-located join, and every
    aggregation keyed on `key`, reads pre-distributed data. At 100 TB the
    repeated fact⋈fact shuffle is the single biggest cost a layout choice
    can delete (tests/test_sinks.py asserts the Exchange-free plan).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
