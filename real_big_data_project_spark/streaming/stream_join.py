"""Stream-stream join: click-to-view attribution within a time window —
the hardest Structured Streaming operator (both sides buffer state;
watermarks bound it and expire unmatched rows).

Topology: two watermarked streams over the tick feed (views / clicks),
inner-joined on the series key plus an event-time interval
(click within 1 hour after the view). Inner-join matches emit as soon as
both sides have arrived — the watermark governs STATE EXPIRY, not
emission — so an availableNow drain yields exactly the batch join,
which is what the oracle checks.

State at scale: each side buffers rows until the other side's watermark
passes the join-condition horizon (1 hour + delay here) — memory is
bounded by (arrival rate × horizon) per key, independent of history.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ohlcv_stream import read_events_stream


_NTZ = (
    "timestampadd(MICROSECOND, unix_micros({c}),"
    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
)


def run_stream_stream_attribution(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """(view_id, click_id, user_id, view_ts, click_ts): every click within
    `window` after a view by the same user.

    Both sides derive from ONE streaming source (a stream-stream
    self-join): the file listing/offset tracking is paid once, and in a
    production landing zone the two sides are guaranteed to advance in
    lock-step instead of racing two independent readers."""
    ev = read_events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.expr(f"view_ts + INTERVAL {window}")),
        "inner",
    )
    from .drain import drain_available_now

    out = drain_available_now(joined, "append", "attr")
    return out.select(
        "view_id", "click_id",
        F.col("v_user").alias("user_id"),
        F.expr(_NTZ.format(c="view_ts")).alias("view_ts"),
        F.expr(_NTZ.format(c="click_ts")).alias("click_ts"),
    )
