"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``real_big_data_project_spark`` package; this
module only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: daily OHLCV bars + Bollinger bands over the tick
    feed (`events` plays the reference's `stocks` hypertable) — the
    dashboard tab-1 chart query end-to-end (SURVEY.md §3.2)."""
    from real_big_data_project_spark.operators.aggregates import ohlcv_daily
    from real_big_data_project_spark.operators.windows import rolling_bollinger
    from real_big_data_project_spark.sources.registry import events_with_volume

    ticks = events_with_volume(spark, SF0001)
    daily = ohlcv_daily(
        ticks, key="user_id", ts="ts", price="value", volume="volume",
        day_alias="trade_date", tiebreak="event_id",
    )
    bands = rolling_bollinger(
        daily, key="user_id", ts="trade_date", price="close",
        window_size=5, num_std=2.0,
    )
    return bands.orderBy("user_id", "trade_date")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from real_big_data_project_spark.plans import queries_map

    return queries_map()


def oracle_sql() -> dict[str, str]:
    from real_big_data_project_spark.plans import oracle_sql_map

    return oracle_sql_map()
