"""Excel source (SURVEY.md §2.1 S3) — the reference reads `.xlsx` Euronext
files with ``pd.read_excel`` (etl/etl.py:510-511).

Spark core has no Excel reader; the idiomatic adapter is driver-side
``pandas.read_excel`` → ``spark.createDataFrame`` for the small daily
listing files (one per day, thousands of rows — never big data), keeping
the cluster path parquet/CSV. The openpyxl engine is not installed in
this container, so the adapter degrades to a clear error and the tests
skip — the plumbing and schema contract are what parity requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - environment probe
    import openpyxl  # noqa: F401

    HAS_EXCEL = True
except Exception:  # pragma: no cover
    HAS_EXCEL = False


def read_excel_listing(spark: SparkSession, path: str) -> DataFrame:
    """S3 — one Euronext daily `.xlsx` → DataFrame (driver-side decode;
    these files are per-day dimension-sized, not fact-sized)."""
    if not HAS_EXCEL:
        raise NotImplementedError(
            "Excel support requires openpyxl (pandas.read_excel engine); "
            "not available in this environment. Use the TSV path "
            "(sources/csv_source.py) — the reference treats them as "
            "interchangeable feeds (etl/etl.py:507-511)."
        )
    import pandas as pd

    return spark.createDataFrame(pd.read_excel(path))
