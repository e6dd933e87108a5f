"""One-off: reproduce the sf100 q_dedup_ngram_jaccard failure with full
stderr visible (the sweep's 300-char tail lost the exception). Runs the
sf100 leg ONLY — no sf10 legs, no oracle."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF100 = os.path.join(REPO, "_artifacts", "organic_sf100")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("diag-ngram-sf100")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "64g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from real_big_data_project_spark.plans import catalog as C

    C._load_all()
    builder = C.QUERIES["q_dedup_ngram_jaccard"].builder
    t0 = time.time()
    n = builder(spark, SF100).count()
    print(f"OK rows={n} t={time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
