"""Stage-level profile of q_dedup_components at a given corpus dir.

The round-9 organic sweep flagged q_dedup_components at x12.4 for 10x
rows (sf1 9.8 s -> sf10 121.3 s) while its candidate stage alone scaled
x3.8 — this probe decomposes the query into its stages and times each,
plus counts the star rounds, so the superlinear component is localized
instead of guessed at. Usage:

    python tools/probe_components.py _artifacts/organic_sf10
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-components")
        # Match the sweep configuration the flagged ratio was recorded
        # under (partitions track DATA: 512 initial + AQE coalesce --
        # round 9's partitions-track-data lesson; at fixed 64 the probe
        # would price this box's spill curve, not the sweep's plan).
        .config("spark.sql.shuffle.partitions", "512")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "64g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from real_big_data_project_spark.datapipe import corpus as CP
    from real_big_data_project_spark.datapipe import dedup_text as DT
    from real_big_data_project_spark.datapipe.components import (
        _large_star, _small_star, dedup_components,
    )
    from real_big_data_project_spark.sources import registry as R

    docs = R.load_table(spark, sf_dir, "documents")
    corpus = CP.with_near_duplicates(docs)

    def t(label, fn):
        t0 = time.time()
        out = fn()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)
        return out

    def noop(df):
        # noop writer, not .count(): count() lets Catalyst eliminate
        # cardinality-preserving joins (the relabel join IS one) — the
        # round-9 honest-pricing protocol (bench.py/sweeps).
        df.write.format("noop").mode("overwrite").save()

    # stage 1: candidates alone (warm once, time once)
    DT.minhash_lsh_candidates(corpus, n_shingle=3).count()
    t("candidates (timed, warm)", lambda: noop(DT.minhash_lsh_candidates(
        corpus, n_shingle=3)))

    # stage 2: star rounds, instrumented (checkpointed edges — candidate
    # cost excluded)
    cand = DT.minhash_lsh_candidates(corpus, n_shingle=3)
    edges = (
        cand.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    print(f"edges: {edges.count()}", flush=True)
    cur, rounds = edges, 0
    t0 = time.time()
    while True:
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        rounds += 1
        r0 = time.time()
        same = nxt.count() == cur.count() and nxt.exceptAll(cur).isEmpty()
        conv_t = time.time() - r0
        print(f"round {rounds}: |E|={nxt.count()} "
              f"(convergence check {conv_t:.2f}s, "
              f"cumulative {time.time() - t0:.2f}s)", flush=True)
        cur = nxt
        if same or rounds >= 20:
            break
    print(f"star rounds total: {time.time() - t0:.2f}s "
          f"({rounds} rounds)", flush=True)

    # stage 3: the full query end-to-end (fresh plan), timed, noop-forced
    t("dedup_components end-to-end", lambda: noop(dedup_components(
        DT.minhash_lsh_candidates(corpus, n_shingle=3))))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else os.path.join(REPO, "_artifacts",
                                            "organic_sf10")))
