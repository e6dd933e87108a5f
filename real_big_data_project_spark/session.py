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
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs the engine depends on to a session we
    did not build (e.g. the verification driver's)."""
    spark.conf.set(NANOS_AS_LONG, "true")
