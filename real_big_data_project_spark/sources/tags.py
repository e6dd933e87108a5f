"""The `tags` key→value metadata table (reference
etl/timescaledb_model.py:278: ``tags(name VARCHAR PRIMARY KEY, value
VARCHAR)`` — pipeline bookkeeping like schema versions and watermarks).

A primary-key UPSERT has no direct Parquet analogue, so the Spark
restatement is an append-only log with last-write-wins resolution:

  * ``set_tag`` appends one (name, value, seq) row — seq is the current
    per-name max + 1, so writes are totally ordered per key without any
    wall clock (deterministic, replayable);
  * readers resolve the latest value with one tiny hash-aggregate
    (max_by) — the table is metadata-sized (dozens of rows), so the
    resolve is a broadcast-scale no-op at any data scale;
  * ``compact_tags`` rewrites the log to its resolved state — the
    occasional VACUUM that keeps a hot writer's log short.

Append-log + read-time-resolve is exactly how a KV surface should meet an
immutable columnar store; an in-place UPDATE would need a transactional
table format instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TAGS_TABLE = "tags"


def _exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def set_tag(spark: SparkSession, name: str, value: str,
            table: str = TAGS_TABLE) -> None:
    """Upsert: append (name, value, next seq). Last write wins on read."""
    if _exists(spark, table):
        prev = (
            spark.table(table)
            .filter(F.col("name") == name)
            .agg(F.coalesce(F.max("seq"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
    else:
        prev = 0
    row = spark.createDataFrame(
        [(name, value, prev + 1)], "name string, value string, seq long"
    )
    row.write.mode("append").format("parquet").saveAsTable(table)


def resolve_tags_log(log: DataFrame) -> DataFrame:
    """Last-write-wins resolve of a (name, value, seq) log: one hash
    aggregate (max_by), NULL-value tombstones dropped. THE read path —
    every consumer (tags_df, the oracled q_tags_resolve) goes through
    this function so the correctness gate covers the production code,
    not a parallel copy."""
    return (
        log.groupBy("name")
        .agg(F.max_by("value", "seq").alias("value"))
        .filter(F.col("value").isNotNull())  # drop tombstones
    )


def tags_df(spark: SparkSession, table: str = TAGS_TABLE) -> DataFrame:
    """Resolved view: one row per name, latest value (max seq wins)."""
    if not _exists(spark, table):
        return spark.createDataFrame([], "name string, value string")
    return resolve_tags_log(spark.table(table))


def get_tag(spark: SparkSession, name: str,
            table: str = TAGS_TABLE) -> str | None:
    rows = tags_df(spark, table).filter(F.col("name") == name).collect()
    return rows[0]["value"] if rows else None


def delete_tag(spark: SparkSession, name: str,
               table: str = TAGS_TABLE) -> None:
    """Tombstone via NULL value; resolved readers drop NULLs."""
    set_tag(spark, name, None, table)  # type: ignore[arg-type]


def compact_tags(spark: SparkSession, table: str = TAGS_TABLE) -> None:
    """Rewrite the log as its resolved state (seq reset to 1), dropping
    tombstones — bounded metadata no matter how chatty the writers."""
    if not _exists(spark, table):
        return
    resolved = tags_df(spark, table)
    snapshot = resolved.withColumn("seq", F.lit(1).cast("long")).collect()
    df = spark.createDataFrame(snapshot, "name string, value string, seq long") \
        if snapshot else spark.createDataFrame([], "name string, value string, seq long")
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
