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


@register(
    "q_streaming_dedup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    """,
    description="Streaming dedup (exactly-once over at-least-once "
                "delivery): a landing dir holding every event file TWICE "
                "is drained through dropDuplicatesWithinWatermark on the "
                "event key — first arrival wins, state bounded by the "
                "watermark horizon. Draining must reproduce the "
                "non-duplicated events table exactly, so the oracle is a "
                "plain SELECT from it.",
    tags=("streaming",),
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.dedup_stream import run_streaming_dedup

    out = run_streaming_dedup(spark, sf_dir)
    return out.select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "q_streaming_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, e.value
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    """,
    description="Stream-static enrichment join (the reference's "
                "cid-stamping under continuous arrival): each micro-batch "
                "broadcast-joins the static dimension snapshot — "
                "stateless, no watermark, dim refreshed per batch; the "
                "drain must equal the batch left join.",
    tags=("streaming",),
)
def q_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.dedup_stream import run_streaming_enrich

    return run_streaming_enrich(spark, sf_dir).select(
        "event_id", "user_id", "c_name", "value"
    )


@register(
    "q_streaming_sessions",
    oracle="""
    WITH gapped AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gapped
    )
    SELECT user_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
    description="Streaming session windows (session_window + watermark): "
                "state = live sessions only, evicted on finalize; the "
                "complete-mode availableNow drain must equal the batch "
                "gap-sessionization (same oracle shape as q_sessionize) — "
                "the stateful-merge counterpart of the batch lag+cumsum.",
    tags=("streaming",),
)
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.sessions import run_streaming_sessions

    out = run_streaming_sessions(spark, sf_dir)
    return out.select("user_id", "n_events", "session_start", "session_end")


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
           v.ts AS view_ts, c.ts AS click_ts
    FROM events v JOIN events c
      ON c.user_id = v.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    description="Stream-stream interval join (click-to-view attribution "
                "within 1 hour): both sides watermarked, state bounded by "
                "the join horizon, inner matches emit on arrival — the "
                "availableNow drain must equal the batch interval join. "
                "The hardest Structured Streaming operator, completing "
                "the streaming family (agg, dedup, sessions, stateful, "
                "stream-static, stream-stream).",
    tags=("streaming",),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_join import run_stream_stream_attribution

    out = run_stream_stream_attribution(spark, sf_dir)
    return out.select("view_id", "click_id", "user_id", "view_ts", "click_ts")


@register(
    "q_streaming_stateful_pct",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           CASE WHEN lag(value) OVER w IS NULL OR lag(value) OVER w = 0
                THEN 0.0
                ELSE (value - lag(value) OVER w) / abs(lag(value) OVER w)
           END AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="Custom stateful streaming operator via "
                "applyInPandasWithState: per-series running pct-change "
                "with GroupState carrying the last (ts, value) — O(#series)"
                " state, Arrow-batched per group. Drained with availableNow"
                " it must equal the batch lag window — same oracle.",
    tags=("streaming",),
)
def q_streaming_stateful_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import run_stateful_pct_change

    out = run_stateful_pct_change(spark, sf_dir)
    return out.select("event_id", "user_id", "ts", "value",
                      "prev_value", "pct_change")
