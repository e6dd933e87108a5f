"""real_big_data_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project ``petitwhito/real_big_data_project`` (a pandas+TimescaleDB
stock-market ETL + dashboard), re-expressed Spark-first: lazy DataFrames,
Catalyst/AQE optimization, broadcast joins, partitioned Parquet, and
``spark.sql()`` as the arbitrary-SQL surface.

Layout:
- ``session``    — SparkSession construction tuned for local + cluster.
- ``sources``    — scans (parquet/csv/pickle-feed), filename metadata,
                   partition pruning, sinks.
- ``operators``  — relational operators (cleansing, dedup, joins,
                   aggregates, windows, set ops) from SURVEY.md §2.
- ``functions``  — scalar/vector/text/hash function library.
- ``plans``      — the named query catalog wired to the driver contract
                   (``__spark_entry__``), each with a DuckDB oracle.
- ``pipeline``   — the end-to-end ETL (raw feeds → companies/stocks/
                   daystocks), the Spark restatement of SURVEY.md §3.1.
- ``datapipe``   — large-scale training-data operators: dedup families
                   (exact/MinHash-LSH/SimHash/n-gram/embedding), ANN
                   similarity search, text QC, multimodal plumbing.
- ``streaming``  — Structured Streaming variants (OHLCV over a file feed).
"""

__version__ = "0.1.0"
