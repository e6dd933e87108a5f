"""Streaming queries — the Structured Streaming restatement of the
reference's incremental day-rollover ETL (SURVEY.md §2.12 / §7 phase 6).

The streaming OHLCV query is oracle-checked: draining the file source with
``availableNow`` must produce exactly the batch daily bars, so the DuckDB
oracle is the same SQL as q_ohlcv_daily. This pins the hard invariant that
the incremental plan computes the same function as the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register


@register(
    "q_streaming_ohlcv",
    oracle="""
    SELECT user_id, cast(ts AS DATE) AS trade_date,
           first(value ORDER BY ts, event_id) AS open,
           last(value ORDER BY ts, event_id) AS close,
           max(value) AS high,
           min(value) AS low,
           cast(sum((event_id % 1000) + 1) AS BIGINT) AS volume,
           (first(value ORDER BY ts, event_id) + last(value ORDER BY ts, event_id)
            + max(value) + min(value)) / 4 AS mean
    FROM events
    GROUP BY user_id, cast(ts AS DATE)
    """,
    description="Structured Streaming daily OHLCV: file source → 1-day "
                "watermark → tumbling-window min_by/max_by aggregation → "
                "memory sink (availableNow drain). Must equal the batch "
                "q_ohlcv_daily bit-for-bit — same oracle.",
    tags=("streaming",),
)
def q_streaming_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ohlcv_stream import run_ohlcv_available_now

    out = run_ohlcv_available_now(spark, sf_dir)
    return out.select(
        "user_id", "trade_date", "open", "close", "high", "low",
        F.col("volume").cast("bigint").alias("volume"), "mean",
    )
