"""Shared availableNow drain: foreachBatch → parquet, read back lazily.

Every local/test harness in this package drains a stream once and hands
the result to the correctness gate. The first implementation used the
``memory`` sink, which collects every output row into the DRIVER — fine
at sf0.01, an OOM by construction at production scale, and in the bench
it made each streaming query pay a full driver materialization that no
batch query pays.

This drain is the production shape instead: ``foreachBatch`` writes each
micro-batch with the normal distributed parquet writer (executors write,
the driver never holds rows), and the caller gets a lazy scan of the
drained directory. Output modes map to write modes: ``complete``
overwrites (last batch = full result), ``append``/``update`` append
(Structured Streaming emits each appended/updated row exactly once
across an availableNow drain with a fresh checkpoint).

State-store sizing: the drains also pin ``spark.sql.shuffle.partitions``
to a small count for the duration of the stream — a one-shot local drain
wants a handful of state stores, not one per configured batch shuffle
partition (each store is per-partition commit IO per micro-batch; at
sf0.1 the 32-partition default spent more time committing empty stores
than aggregating). A continuous production job sizes this to its own
state volume instead; results are partition-count-independent either
way (tests/test_stress.py runs the catalog under a prime partition
count).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

_ARTIFACTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "_artifacts",
)
DRAIN_ROOT = os.path.join(_ARTIFACTS, "stream_drains")

# Small fixed state-store count for one-shot local drains (see module doc).
DRAIN_SHUFFLE_PARTITIONS = "8"


def drain_available_now(
    df: DataFrame,
    output_mode: str,
    tag: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Run `df` (a streaming DataFrame) to completion with
    ``trigger(availableNow=True)``, writing every micro-batch to a fresh
    parquet directory via ``foreachBatch``; return a lazy batch scan of
    the drained output (empty-but-typed frame if the source was empty)."""
    spark = df.sparkSession
    out_dir = os.path.join(DRAIN_ROOT, f"{tag}_{uuid.uuid4().hex[:8]}")
    write_mode = "overwrite" if output_mode == "complete" else "append"

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(out_dir)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", DRAIN_SHUFFLE_PARTITIONS)
    # One-shot drains emit every row in the data batches themselves; the
    # trailing no-data micro-batch only advances watermarks/evicts state,
    # which a terminating drain doesn't need — skip its fixed cost.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            df.writeStream.foreachBatch(write_batch)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .queryName(f"drain_{tag}")
            .start()
        )
        try:
            # availableNow drains finish in seconds; cap the wait so a
            # stalled source fails loudly instead of hanging the harness
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(f"streaming drain {tag!r} exceeded {timeout_s}s")
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )

    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], df.schema)
    # schema is known — skip the footer-sampling inference job
    return spark.read.schema(df.schema).parquet(out_dir)
