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


def _running_pct_change(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-group: sort this batch by (ts, event_id), thread the carried
    last value through it, persist the new tail. None (never NaN) for the
    first-ever row's prev so the sink column is genuinely NULL.

    Rows at or before the persisted last_ts are LATE DATA and are dropped
    (the watermark discipline): processing them against a future state
    value would corrupt pct_change, and the state must never rewind —
    an out-of-order backfill file would otherwise poison every later
    batch."""
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
    state.update((int(rows["ts"].iloc[-1]), float(rows["value"].iloc[-1])))
    out = rows[["event_id", "user_id", "ts", "value"]].copy()
    out["prev_value"] = pd.Series(prevs, dtype=object, index=rows.index)
    out["pct_change"] = pcts
    yield out


def run_stateful_pct_change(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the events file source through the stateful operator with
    availableNow. With the default single file that is one microbatch
    (and the UDF's in-batch sort makes it equal the batch lag query —
    the oracle); with `max_files_per_trigger` over a multi-file landing
    dir it is genuinely incremental and GroupState carries values across
    microbatches (tests/test_streaming.py proves the carry-over)."""
    ensure_session_confs(spark)
    reader = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(sf_dir)
    changed = raw.groupBy("user_id").applyInPandasWithState(
        _running_pct_change,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from .drain import drain_available_now

    out = drain_available_now(changed, "append", "stateful_pct",
                              shuffle_partitions="16")
    return out.withColumn(
        "ts", F.expr(ts_long_to_ntz(events_ts_divisor(sf_dir, glob)))
    )
