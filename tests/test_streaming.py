"""Streaming semantics tests: the streaming plans must compute exactly
the batch operators' results — including across microbatch boundaries,
where GroupState (not a window over history) carries the running state."""

from __future__ import annotations

import contextlib
import os

import pandas as pd
import pytest

from real_big_data_project_spark.operators.windows import lag_pct_change
from real_big_data_project_spark.sources.registry import load_table

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_artifacts")


def test_streaming_ohlcv_equals_batch(spark, sf_dir):
    from real_big_data_project_spark.operators.aggregates import ohlcv_daily
    from real_big_data_project_spark.sources.registry import events_with_volume
    from real_big_data_project_spark.streaming.ohlcv_stream import (
        run_ohlcv_available_now,
    )

    stream = run_ohlcv_available_now(spark, sf_dir)
    batch = ohlcv_daily(
        events_with_volume(spark, sf_dir),
        key="user_id", ts="ts", price="value", volume="volume",
        day_alias="trade_date", tiebreak="event_id",
    )
    s = stream.orderBy("user_id", "trade_date").collect()
    b = batch.select(*stream.columns).orderBy("user_id", "trade_date").collect()
    assert s == b


@pytest.fixture()
def landing_dir(sf_dir):
    """events split into two time-ordered parquet files (a landing dir),
    modification times forced so the file source picks them up in order."""
    out = os.path.join(ART, "stream_landing")
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(out):
        os.remove(os.path.join(out, f))
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["ts", "event_id"])
    mid = len(pdf) // 2
    p1, p2 = os.path.join(out, "batch1.parquet"), os.path.join(out, "batch2.parquet")
    pdf.iloc[:mid].to_parquet(p1, index=False)
    pdf.iloc[mid:].to_parquet(p2, index=False)
    os.utime(p1, (1_700_000_000, 1_700_000_000))
    os.utime(p2, (1_700_000_100, 1_700_000_100))
    return out


def test_stateful_pct_change_drops_late_backfill(spark, sf_dir):
    """An out-of-order backfill file (older event times arriving in a
    LATER microbatch) must be dropped as late data — never processed
    against a future state value, never rewinding the state."""
    from real_big_data_project_spark.streaming.stateful import (
        run_stateful_pct_change,
    )

    out = os.path.join(ART, "stream_landing_ooo")
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(out):
        os.remove(os.path.join(out, f))
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(["ts", "event_id"])
    mid = len(pdf) // 2
    p_new = os.path.join(out, "recent.parquet")
    p_old = os.path.join(out, "backfill.parquet")
    pdf.iloc[mid:].to_parquet(p_new, index=False)   # NEWER data first...
    pdf.iloc[:mid].to_parquet(p_old, index=False)   # ...older file second
    os.utime(p_new, (1_700_000_000, 1_700_000_000))
    os.utime(p_old, (1_700_000_100, 1_700_000_100))

    stream = run_stateful_pct_change(
        spark, out, glob="*.parquet", max_files_per_trigger=1
    )
    got_ids = {r.event_id for r in stream.select("event_id").collect()}
    newer_ids = set(pdf.iloc[mid:]["event_id"])
    assert got_ids == newer_ids  # every backfill row dropped, none corrupted


def test_stateful_pct_change_carries_state_across_microbatches(spark, landing_dir, sf_dir):
    from real_big_data_project_spark.streaming.stateful import (
        run_stateful_pct_change,
    )

    stream = run_stateful_pct_change(
        spark, landing_dir, glob="*.parquet", max_files_per_trigger=1
    )
    batch = lag_pct_change(
        load_table(spark, sf_dir, "events"), key="user_id", ts="ts", price="value"
    )
    s = stream.select("event_id", "prev_value", "pct_change").orderBy("event_id").collect()
    b = batch.select("event_id", "prev_value", "pct_change").orderBy("event_id").collect()
    assert len(s) == len(b) > 0
    # row 1 of batch2 for each user must see batch1's tail value — that
    # equality is exactly what GroupState carry-over provides
    assert s == b


def test_checkpoint_restart_processes_each_file_exactly_once(spark, sf_dir, tmp_path):
    """Operational exactly-once: restarting a file-source query against the
    same checkpoint must skip already-committed input files — the property
    that makes a production landing-dir pipeline restartable without
    double-ingest."""
    import shutil

    from pyspark.sql import functions as F

    from real_big_data_project_spark.streaming.ohlcv_stream import (
        EVENTS_RAW_SCHEMA,
    )

    landing = tmp_path / "landing"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    landing.mkdir()
    src = os.path.join(sf_dir, "events.parquet")

    def drain():
        raw = (spark.readStream.schema(EVENTS_RAW_SCHEMA)
               .parquet(str(landing))
               .select("event_id", "user_id", "value"))
        q = (raw.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        try:
            q.awaitTermination()
        finally:
            q.stop()
        return spark.read.parquet(sink).count()

    n = spark.read.parquet(src).count()
    shutil.copyfile(src, landing / "events_a.parquet")
    assert drain() == n
    # a second drain with NO new input appends nothing...
    assert drain() == n
    # ...and a new file is processed exactly once (file A never replays)
    shutil.copyfile(src, landing / "events_b.parquet")
    assert drain() == 2 * n


def test_foreach_batch_upsert_keeps_latest_per_key(spark, tmp_path):
    """foreachBatch merge sink: each micro-batch upserts day-bars by key
    into a parquet table (read-modify-write inside the batch function) —
    the production pattern for sinks without native MERGE. Processing two
    files where the second revises a key must leave exactly one row per
    key with the latest value."""
    import datetime as dt

    from pyspark.sql import functions as F

    from real_big_data_project_spark.streaming.ohlcv_stream import (
        EVENTS_RAW_SCHEMA,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "bars")
    ckpt = str(tmp_path / "ckpt")

    def nanos(d, h):
        return int(dt.datetime(2024, 1, d, h).timestamp() * 1e9)

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_flat(path, rows):
        cols = list(zip(*rows))
        pq.write_table(pa.table({
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.int64()),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }), path)

    rows1 = [(1, nanos(1, 10), 7, "click", 100.0, "{}")]
    rows2 = [(2, nanos(1, 11), 7, "click", 250.0, "{}"),   # revises key 7
             (3, nanos(1, 10), 8, "view", 50.0, "{}")]
    write_flat(str(landing / "f1.parquet"), rows1)

    def upsert(batch_df, _batch_id):
        incoming = (batch_df.groupBy("user_id")
                    .agg(F.max_by("value", "ts").alias("last_value"),
                         F.max("ts").alias("ts")))
        sp = incoming.sparkSession
        try:
            current = sp.read.parquet(target)
        except Exception:
            current = None
        if current is not None:
            keep = current.join(incoming.select("user_id"), "user_id",
                                "left_anti")
            merged = keep.unionByName(incoming)
        else:
            merged = incoming
        merged.persist().count()          # materialize BEFORE overwrite
        merged.write.mode("overwrite").parquet(target + "_next")
        sp.read.parquet(target + "_next").write.mode("overwrite").parquet(target)
        merged.unpersist()

    def drain():
        raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(str(landing))
        q = (raw.writeStream.foreachBatch(upsert)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination()
        finally:
            q.stop()

    drain()
    first = {r.user_id: r.last_value for r in spark.read.parquet(target).collect()}
    assert first == {7: 100.0}

    write_flat(str(landing / "f2.parquet"), rows2)
    drain()
    final = {r.user_id: r.last_value for r in spark.read.parquet(target).collect()}
    assert final == {7: 250.0, 8: 50.0}


def test_idempotent_sink_survives_batch_replay(spark, tmp_path):
    """Re-invoking foreachBatch with an already-committed batchId (the
    at-least-once replay Structured Streaming documents) must not
    duplicate rows; an uncommitted partial write is replaced."""
    import os

    from real_big_data_project_spark.streaming.drain import (
        idempotent_parquet_sink, read_idempotent_sink)

    sink_dir = str(tmp_path / "sink")
    os.makedirs(sink_dir)
    write = idempotent_parquet_sink(sink_dir)
    b0 = spark.range(5).toDF("v")
    b1 = spark.range(5, 8).toDF("v")

    write(b0, 0)
    write(b1, 1)
    write(b0, 0)  # replay of a committed batch: no-op
    got = sorted(r.v for r in read_idempotent_sink(spark, sink_dir).collect())
    assert got == list(range(8))

    # partial (uncommitted) write, then replay commits it exactly once
    os.remove(os.path.join(sink_dir, "_committed_1"))
    write(b1, 1)
    got = sorted(r.v for r in read_idempotent_sink(spark, sink_dir).collect())
    assert got == list(range(8))


# ---------------------------------------------------------------------------
# Watermark-driven state EVICTION soaks (VERDICT r6 item 8): multi-batch
# drains asserting the state store actually SHRINKS as the watermark
# passes — numRowsRemoved/numRowsTotal from StreamingQueryProgress, not
# output equality.
# ---------------------------------------------------------------------------

_DAY_USERS = 20
_EVENTS_PER_USER = 10


def _three_day_landing(tag: str, day1_only_users: int = 0,
                       duplicate: bool = False) -> tuple[str, int]:
    """3 parquet files (one per day, mtime-ordered so maxFilesPerTrigger=1
    yields 3 microbatches): users 0.._DAY_USERS-1 emit _EVENTS_PER_USER
    events each day at 09:00+i min; optionally `day1_only_users` extra
    users appear ONLY on day 1 (idle-series eviction bait); optionally
    every row is written twice (at-least-once delivery bait). Returns
    (dir, unique_event_count). ts is written timestamp[us] like the
    driver's current events.parquet generation."""
    out = os.path.join(ART, f"soak_landing_{tag}")
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(out):
        os.remove(os.path.join(out, f))
    unique = 0
    for day in (1, 2, 3):
        rows = []
        users = list(range(_DAY_USERS))
        if day == 1:
            users += list(range(100, 100 + day1_only_users))
        for u in users:
            for i in range(_EVENTS_PER_USER):
                eid = day * 1_000_000 + u * 1_000 + i
                ts = pd.Timestamp(f"2024-01-0{day} 09:00:00") \
                    + pd.Timedelta(minutes=i)
                rows.append((eid, ts, u, "tick", 100.0 + i, "{}"))
                unique += 1
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        if duplicate:
            pdf = pd.concat([pdf, pdf], ignore_index=True)
        p = os.path.join(out, f"day{day}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + day * 100,) * 2)
    return out, unique


def _state_ops(progress: list) -> list[dict]:
    return [p["stateOperators"][0] for p in progress
            if p.get("stateOperators")]


# Every eviction soak runs on BOTH state-store providers (VERDICT r7
# item 3): the default HDFS-backed in-memory-map provider, and the
# disk-backed RocksDB provider a large deployment actually runs — state
# larger than executor heap is the 100 TB reality, and a provider swap
# must change neither results nor eviction behavior.
_PROVIDERS = ("hdfs", "rocksdb")
_ROCKSDB_CLASS = ("org.apache.spark.sql.execution.streaming.state."
                  "RocksDBStateStoreProvider")


@contextlib.contextmanager
def _state_store_provider(spark, provider: str):
    """Pin the state-store provider for one drain. The conf is read at
    query start, so setting it around the drain is enough; always
    restored so a soak can never leak its provider into later tests."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        if provider == "rocksdb":
            spark.conf.set(key, _ROCKSDB_CLASS)
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _assert_provider_ran(ops: list[dict], provider: str) -> None:
    """RocksDB proves itself by its customMetrics — a silently-ignored
    conf (typo'd class, missing jar) must fail the soak, not pass it on
    the default provider."""
    if provider == "rocksdb":
        assert ops and any(
            "rocksdb" in k.lower()
            for op in ops for k in (op.get("customMetrics") or {})
        ), "state store did not actually run on RocksDB"


@pytest.mark.parametrize("provider", _PROVIDERS)
def test_streaming_dedup_state_evicts_past_watermark(spark, provider):
    """3-day doubled feed, 1-hour re-delivery horizon: every event still
    lands exactly once, AND the dedup key store shrinks as the watermark
    passes each day — bounded by (arrival rate x horizon), not history."""
    from real_big_data_project_spark.streaming.dedup_stream import (
        run_streaming_dedup,
    )

    landing, n_unique = _three_day_landing(f"dedup_{provider}",
                                           duplicate=True)
    progress: list = []
    with _state_store_provider(spark, provider):
        out = run_streaming_dedup(
            spark, landing, watermark="1 hour", landing=landing,
            max_files_per_trigger=1, progress_sink=progress,
        )
        assert out.count() == n_unique  # exactly-once output, 3 batches
    ops = _state_ops(progress)
    _assert_provider_ran(ops, provider)
    assert len(ops) >= 3
    removed = sum(op["numRowsRemoved"] for op in ops)
    per_day = n_unique // 3
    # day-1 and day-2 keys must have been evicted by the trailing batches
    assert removed >= 2 * per_day, [op["numRowsRemoved"] for op in ops]
    finals = [op["numRowsTotal"] for op in ops]
    assert finals[-1] <= per_day, finals  # only the live horizon remains
    assert max(finals) < n_unique  # the store never held full history


@pytest.mark.parametrize("provider", _PROVIDERS)
def test_streaming_sessions_finalize_and_evict(spark, provider):
    """Append-mode session windows: a session is emitted exactly once
    when the watermark passes its end, and its state row is evicted at
    that moment — day-3 sessions stay open (never emitted), day-1/2
    sessions are both emitted and gone from the store."""
    from real_big_data_project_spark.streaming.sessions import (
        run_streaming_sessions_append,
    )

    landing, _ = _three_day_landing(f"sessions_{provider}")
    progress: list = []
    with _state_store_provider(spark, provider):
        out = run_streaming_sessions_append(
            spark, landing, gap="30 minutes", watermark="1 hour",
            max_files_per_trigger=1, progress_sink=progress,
        ).collect()
    # one session per (user, day); only day1+day2 finalized
    assert len(out) == 2 * _DAY_USERS
    assert all(r.n_events == _EVENTS_PER_USER for r in out)
    ops = _state_ops(progress)
    _assert_provider_ran(ops, provider)
    removed = sum(op["numRowsRemoved"] for op in ops)
    assert removed >= 2 * _DAY_USERS, [op["numRowsRemoved"] for op in ops]
    finals = [op["numRowsTotal"] for op in ops]
    assert finals[-1] <= _DAY_USERS, finals  # only day-3 sessions live


@pytest.mark.parametrize("provider", _PROVIDERS)
def test_stateful_pct_idle_series_evict(spark, provider):
    """EventTimeTimeout on the custom GroupState operator: series idle
    past the timeout horizon are removed from the store (numRowsTotal
    falls to the live-series count), while live series keep their carry
    state and every in-order row is still processed."""
    from real_big_data_project_spark.streaming.stateful import (
        run_stateful_pct_change,
    )

    n_idle = 5
    landing, n_unique = _three_day_landing(f"statefulpct_{provider}",
                                           day1_only_users=n_idle)
    progress: list = []
    with _state_store_provider(spark, provider):
        out = run_stateful_pct_change(
            spark, landing, glob="*.parquet", max_files_per_trigger=1,
            idle_timeout="2 hours", progress_sink=progress,
        )
        assert out.count() == n_unique  # in-order feed: nothing dropped
    ops = _state_ops(progress)
    _assert_provider_ran(ops, provider)
    removed = sum(op["numRowsRemoved"] for op in ops)
    assert removed >= n_idle, [op["numRowsRemoved"] for op in ops]
    finals = [op["numRowsTotal"] for op in ops]
    assert finals[-1] == _DAY_USERS, finals  # idle series gone, live kept
