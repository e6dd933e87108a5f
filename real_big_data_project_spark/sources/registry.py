"""Testdata table registry: parquet scans + temp-view registration.

Mirrors the reference's source layer (SQL source ``df_query``,
etl/timescaledb_model.py:378-398) — here every table is a lazy parquet scan
registered as a temp view so the full Catalyst SQL surface works over it.

The ``events`` table plays the reference's tick table ``stocks``
(etl/timescaledb_model.py:256-263): user_id ⇒ cid, value ⇒ price, and a
deterministic synthetic volume ``(event_id % 1000) + 1`` (the raw feed has a
volume column; the synthetic testdata does not, so we derive one — see
FIXTURES.md §B).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_confs


def fixture_tag(sf_dir: str) -> str:
    """Artifact-cache tag for a scale-factor dir: readable basename plus a
    short hash of the ABSOLUTE path, so two sf dirs sharing a basename
    (different parents) can never reuse each other's stale fixtures."""
    norm = os.path.normpath(os.path.abspath(sf_dir))
    return f"{os.path.basename(norm)}_{hashlib.sha1(norm.encode()).hexdigest()[:10]}"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# events.ts is stored as parquet TIMESTAMP(NANOS); with nanosAsLong it scans
# as a bigint of epoch-nanoseconds. Rebuild a timestamp_ntz purely
# arithmetically (no session-timezone involvement) at microsecond precision:
# the generator only emits whole microseconds, so `div 1000` is lossless.
_TS_FROM_NANOS = "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one testdata table, with type repairs applied."""
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr(_TS_FROM_NANOS))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view — the engine's catalog.

    This is the Spark restatement of the reference's "connect + DDL" step
    (etl/timescaledb_model.py:218-294): instead of CREATE TABLE + hypertable
    DDL, views over columnar parquet; Catalyst provides pruning/pushdown.
    """
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def events_with_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + derived positive volume (FIXTURES.md §B convention)."""
    return load_table(spark, sf_dir, "events").withColumn(
        "volume", (F.col("event_id") % 1000 + 1).cast("long")
    )
