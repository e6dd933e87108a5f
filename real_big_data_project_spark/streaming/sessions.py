"""Streaming session windows: the stateful counterpart of the batch
gap-sessionization (plans/queries_core.py::q_sessionize).

`session_window(ts, gap)` keeps one open-window state row per live
(user, session); events extend the window while they arrive within `gap`
of its end, and the watermark finalizes and evicts closed sessions — so
state is proportional to *concurrently live* sessions, not history. The
batch lag+running-sum formulation and the streaming merge semantics agree
whenever no two consecutive events sit EXACTLY `gap` apart (batch `>`
keeps them together, streaming strict-`<` splits); the local drain is
oracle-checked against the batch SQL, which pins that equivalence on the
test feed.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ohlcv_stream import read_events_stream


_NTZ = (
    "timestampadd(MICROSECOND, unix_micros({c}),"
    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
)


def run_streaming_sessions(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Drain the events feed through a session-window aggregation
    (complete mode + availableNow locally, so unfinalized sessions are
    emitted too and the result equals the batch sessionization)."""
    ticks = read_events_stream(spark, sf_dir)
    sess = (
        ticks.withWatermark("ts", "0 seconds")
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    from .drain import drain_available_now

    out = drain_available_now(sess, "complete", "sessions", shuffle_partitions="16")
    # recover session-tz-independent NTZ bounds (first/last event, not the
    # gap-padded window end)
    return out.select(
        "user_id",
        "n_events",
        F.expr(_NTZ.format(c="first_ts")).alias("session_start"),
        F.expr(_NTZ.format(c="last_ts")).alias("session_end"),
    )


def run_streaming_sessions_append(
    spark: SparkSession,
    landing: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
    progress_sink: list | None = None,
) -> DataFrame:
    """The PRODUCTION shape of the session topology: append mode over a
    landing directory — a session row is emitted exactly once, when the
    watermark passes its end, and its state is EVICTED at that moment
    (complete mode, used by the oracle-checked drain above, keeps all
    state by design and re-emits everything). The eviction soak runs a
    multi-day landing through this and asserts the store shrinks."""
    from ..session import ensure_session_confs
    from ..sources.registry import events_ts_divisor
    from .ohlcv_stream import EVENTS_RAW_SCHEMA

    ensure_session_confs(spark)
    d = events_ts_divisor(landing, glob_pat="*.parquet")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ticks = reader.parquet(landing).withColumn(
        "ts", F.timestamp_micros(F.expr(f"ts div {d}"))
    )
    sess = (
        ticks.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    from .drain import drain_available_now

    out = drain_available_now(
        sess, "append", "sessions_append", shuffle_partitions="16",
        progress_sink=progress_sink,
        no_data_microbatches=progress_sink is not None,
    )
    return out.select(
        "user_id",
        "n_events",
        F.expr(_NTZ.format(c="first_ts")).alias("session_start"),
        F.expr(_NTZ.format(c="last_ts")).alias("session_end"),
    )
