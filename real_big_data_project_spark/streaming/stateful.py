"""Custom stateful streaming operator: per-series running pct-change via
``applyInPandasWithState``.

The batch engine computes pct-change with a lag window
(operators/windows.py::lag_pct_change). The streaming restatement cannot
use a window over unbounded history, so it keeps exactly the state the
operator needs — the last (ts, value) per series — in Spark's GroupState
store: Arrow-batched per-group UDF, incremental, restart-safe via the
checkpoint, state size O(#series) regardless of stream length.

Timestamps stay raw epoch int64 (ns or us, whatever the file stores)
through the stateful operator (no timezone semantics anywhere near the
state or the Arrow boundary); the caller converts to TIMESTAMP_NTZ
after, so results are bit-comparable with the batch lag query under any
session timezone.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import ensure_session_confs
from ..sources.registry import events_ts_divisor, ts_long_to_ntz
from .ohlcv_stream import EVENTS_RAW_SCHEMA

OUT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.LongType()),          # raw epoch int64 (ns or us)
    T.StructField("value", T.DoubleType()),
    T.StructField("prev_value", T.DoubleType()),
    T.StructField("pct_change", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_value", T.DoubleType()),
])


def _make_running_pct_change(idle_timeout_ms: int | None = None,
                             us_divisor: int = 1):
    """Build the per-group stateful function. With ``idle_timeout_ms``
    set (EventTimeTimeout mode), each update arms an event-time timeout
    at last_event + idle_timeout; when the stream watermark passes it the
    group is invoked with no data and its state is REMOVED — bounding the
    store to *live* series instead of every series ever seen (a dead
    ticker's last value is useless state at 100 TB feed scale).
    ``us_divisor`` converts the raw int64 ts to epoch-micros (ns files
    pass 1000)."""

    def _running_pct_change(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per-group: sort this batch by (ts, event_id), thread the
        carried last value through it, persist the new tail. None (never
        NaN) for the first-ever row's prev so the sink column is
        genuinely NULL.

        Rows at or before the persisted last_ts are LATE DATA and are
        dropped (the watermark discipline): processing them against a
        future state value would corrupt pct_change, and the state must
        never rewind — an out-of-order backfill file would otherwise
        poison every later batch."""
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()  # idle series: evict, emit nothing
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            last_ts, last_value = state.get
            rows = rows[rows["ts"] > last_ts]
        else:
            last_value = None
        if rows.empty:
            return
        prevs: list[float | None] = []
        pcts: list[float] = []
        for v in rows["value"]:
            prevs.append(last_value)
            pcts.append(
                0.0 if last_value is None or last_value == 0.0
                else (v - last_value) / abs(last_value)
            )
            last_value = float(v)
        tail_ts = int(rows["ts"].iloc[-1])
        state.update((tail_ts, float(rows["value"].iloc[-1])))
        if idle_timeout_ms is not None:
            state.setTimeoutTimestamp(
                tail_ts // us_divisor // 1000 + idle_timeout_ms
            )
        out = rows[["event_id", "user_id", "ts", "value"]].copy()
        out["prev_value"] = pd.Series(prevs, dtype=object, index=rows.index)
        out["pct_change"] = pcts
        yield out

    return _running_pct_change


# default (no-timeout) instance — the catalog/oracle path
_running_pct_change = _make_running_pct_change()


def run_stateful_pct_change(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    idle_timeout: str | None = None,
    late_horizon: str = "0 seconds",
    progress_sink: list | None = None,
) -> DataFrame:
    """Drain the events file source through the stateful operator with
    availableNow. With the default single file that is one microbatch
    (and the UDF's in-batch sort makes it equal the batch lag query —
    the oracle); with `max_files_per_trigger` over a multi-file landing
    dir it is genuinely incremental and GroupState carries values across
    microbatches (tests/test_streaming.py proves the carry-over).

    ``idle_timeout`` (e.g. "1 hour") switches to EventTimeTimeout: a
    watermark drives eviction of series idle past the horizon — state
    stays O(live series), not O(series ever seen). The eviction soak
    test asserts the store actually shrinks via ``progress_sink``.

    SEMANTIC DIFFERENCE from the no-timeout path (be explicit — review
    finding, round 7): EventTimeTimeout requires a stream watermark, and
    the engine drops rows older than it BEFORE the UDF. The per-key
    guard (state never rewinds) already drops an old row for a key that
    has advanced past it; the watermark additionally drops old rows for
    keys the store has never seen (or has evicted). ``late_horizon``
    is the admission window for such rows — the standard watermark
    trade: a wider horizon admits later backfills AND holds idle state
    proportionally longer before the timeout can fire."""
    ensure_session_confs(spark)
    d = events_ts_divisor(sf_dir, glob)
    reader = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(sf_dir)
    if idle_timeout is not None:
        raw = raw.withColumn(
            "ts_wm", F.timestamp_micros(F.expr(f"ts div {d}"))
        ).withWatermark("ts_wm", late_horizon)
        fn = _make_running_pct_change(
            idle_timeout_ms=_interval_ms(spark, idle_timeout), us_divisor=d
        )
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    else:
        fn = _running_pct_change
        timeout_conf = GroupStateTimeout.NoTimeout
    changed = raw.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
    from .drain import drain_available_now

    out = drain_available_now(
        changed, "append", "stateful_pct", shuffle_partitions="16",
        progress_sink=progress_sink,
        no_data_microbatches=progress_sink is not None,
    )
    return out.withColumn("ts", F.expr(ts_long_to_ntz(d)))


def _interval_ms(spark: SparkSession, interval: str) -> int:
    """'1 hour' -> 3600000, via the SQL interval parser (no hand-rolled
    duration grammar). NTZ anchors: no session-timezone or DST term can
    leak into the difference."""
    row = spark.sql(
        "SELECT timestampdiff(MILLISECOND,"
        " TIMESTAMP_NTZ '2000-01-01 00:00:00',"
        f" TIMESTAMP_NTZ '2000-01-01 00:00:00' + INTERVAL '{interval}')"
        " AS ms"
    ).first()
    return int(row.ms)
