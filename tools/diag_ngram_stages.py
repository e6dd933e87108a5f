"""Stage-level decomposition of q_dedup_ngram_jaccard at a corpus dir.

VERDICT r9 item 4: the organic sf100 sweep prices the query at x13.4
for 10x rows while its CANDIDATES are exactly linear (3.32M pairs =
10x sf10) — this tool separates the three plan phases so the residual
is attributed, not guessed at:

  A. candidate generation — minhash_lsh_candidates (band shuffle);
  B. the doc-keyed shingle-set build — exploded_shingles -> xxhash64 ->
     collect_set (the corpus-sized doc-key shuffle); the full query
     executes this TWICE (both verification sides, deliberately
     unpinned — dedup_text.py's value-width counter-case note);
  C. the full query (A + 2B + the two verification joins + filter).

All stages noop-forced (the honest-pricing protocol: count() would let
Catalyst eliminate the verification joins' cardinality-preserving
parts). Run once per scale in a fresh JVM:

    python tools/diag_ngram_stages.py _artifacts/organic_sf10
    python tools/diag_ngram_stages.py _artifacts/organic_sf100

Prints one JSON line: stage seconds + candidate/pair counts, and the
derived residual C - A - 2B (the verification joins' own cost under
the additive model; a large residual at sf100 but not sf10 localizes
the superlinearity to the joins, a large B growth localizes it to the
doc-key shuffle's spill curve).
"""

from __future__ import annotations

import json
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
        .appName("diag-ngram-stages")
        # Match sweep_organic_sf100's configuration: partitions track
        # DATA size (512 initial + AQE coalesce), not a fixed 64 — the
        # decomposition must price the same plans the sweep priced.
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
    from real_big_data_project_spark.sources import registry as R

    docs = R.load_table(spark, sf_dir, "documents")
    corpus = CP.with_near_duplicates(docs)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 2)

    def shingle_sets():
        return (
            DT.exploded_shingles(corpus, 3, "doc_id", "text")
            .select("doc_id", F.xxhash64("shingle").alias("h"))
            .groupBy("doc_id")
            .agg(F.collect_set("h").alias("shingles"))
        )

    def full():
        cand = DT.minhash_lsh_candidates(corpus, n_shingle=3)
        return DT.ngram_jaccard_pairs(corpus, cand, n_shingle=3,
                                      threshold=0.6)

    row: dict = {"sf_dir": sf_dir}
    # Warm pass per stage (JIT + fixture/footer reads), then one timed.
    noop(DT.minhash_lsh_candidates(corpus, n_shingle=3))
    row["a_candidates_s"] = timed(
        lambda: noop(DT.minhash_lsh_candidates(corpus, n_shingle=3)))
    row["n_candidates"] = DT.minhash_lsh_candidates(
        corpus, n_shingle=3).count()

    noop(shingle_sets())
    row["b_shingle_sets_s"] = timed(lambda: noop(shingle_sets()))

    noop(full())
    row["c_full_s"] = timed(lambda: noop(full()))
    row["n_pairs"] = full().count()

    row["residual_joins_s"] = round(
        row["c_full_s"] - row["a_candidates_s"]
        - 2 * row["b_shingle_sets_s"], 2)
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else os.path.join(REPO, "_artifacts",
                                            "organic_sf10")))
