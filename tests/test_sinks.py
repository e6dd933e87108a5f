"""S6 sink tests: the date-partitioned parquet layout must (a) round-trip
the data and (b) actually PRUNE partitions for date predicates — the
hypertable behavior the reference gets from TimescaleDB chunks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_big_data_project_spark.sources.registry import load_table
from real_big_data_project_spark.sources.sinks import (
    PARTITION_COL,
    read_time_partitioned,
    write_time_partitioned,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_artifacts", "sink_events")


def test_partitioned_sink_roundtrip_and_pruning(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("date"),
        F.col("user_id").alias("cid"),
        F.col("value"),
    )
    write_time_partitioned(ev, OUT)

    back = read_time_partitioned(spark, OUT)
    assert back.count() == ev.count()

    # physical layout: one directory per day
    days = [d for d in os.listdir(OUT) if d.startswith(f"{PARTITION_COL}=")]
    n_days = ev.select(F.col("date").cast("date")).distinct().count()
    assert len(days) == n_days

    # a one-day predicate must reach the scan as a partition filter and
    # read only that day's files
    one_day = sorted(days)[0].split("=", 1)[1]
    q = back.filter(F.col(PARTITION_COL) == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and one_day in plan
    expected = ev.filter(F.col("date").cast("date") == one_day).count()
    assert q.count() == expected


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """X-series scale feature: same-key same-count bucketed tables must
    sort-merge join with NO Exchange on either side (the write-once
    shuffle replaces every join-time shuffle)."""
    from real_big_data_project_spark.sources.sinks import write_bucketed

    ev = load_table(spark, sf_dir, "events")
    write_bucketed(ev.select("event_id", "user_id", "value"),
                   "bkt_events", "user_id", n_buckets=8,
                   sort_cols=["user_id"])
    write_bucketed(
        ev.groupBy("user_id").agg(F.count("*").alias("n_events")),
        "bkt_users", "user_id", n_buckets=8, sort_cols=["user_id"])

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_events").join(spark.table("bkt_users"), "user_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_events")
        spark.sql("DROP TABLE IF EXISTS bkt_users")
