"""Stage-level decomposition of q_dedup_ngram_jaccard at a corpus dir.

VERDICT r9 item 4 / r10 ask #1: the organic sf100 sweep prices the query
at x13.4 for 10x rows while its CANDIDATES are exactly linear (3.32M
pairs = 10x sf10) — this tool separates the three plan phases so the
residual is attributed, not guessed at:

  A. candidate generation — minhash_lsh_candidates (band shuffle);
  B. the doc-keyed shingle-set build — exploded_shingles -> xxhash64 ->
     collect_set (the corpus-sized doc-key shuffle); the full query
     executes this TWICE (both verification sides, deliberately
     unpinned — dedup_text.py's value-width counter-case note);
  C. the full query (A + 2B + the two verification joins + filter).

Isolation (round 11): each stage runs in its OWN subprocess — a fresh
JVM per stage, the same policy the sweeps adopted in round 7. The first
cut of this tool ran A, B, C sequentially in ONE session and its C
number came out 3x the sweep's own warm number for the identical plan
(100.6 s vs 34.7 s at organic_sf10): by stage C the session carried
shuffle files and ContextCleaner debt from ~6 prior corpus-scale
executions, so the "residual" was mostly JVM state, not the joins.
Fresh-JVM stages make the additive model C - A - 2B honest.

Per stage: fixture-touching read-path warm scan, one UNTIMED warm pass
of the stage's own plan, one TIMED noop-forced pass (the honest-pricing
protocol: count() would let Catalyst eliminate the verification joins'
cardinality-preserving parts), then untimed row counts where cheap.

    python tools/diag_ngram_stages.py _artifacts/organic_sf10
    python tools/diag_ngram_stages.py _artifacts/organic_sf100

Prints one JSON line: per-stage seconds + candidate/pair counts, and
the derived residual C - A - 2B (the verification joins' own cost under
the additive model; a large residual at sf100 but not sf10 localizes
the superlinearity to the joins, a large B growth localizes it to the
doc-key shuffle's spill curve).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGE_TIMEOUT_S = 3600


def run_stage(sf_dir: str, stage: str) -> int:
    """One stage, fresh JVM. Prints a one-line JSON dict."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName(f"diag-ngram-{stage}")
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

    builders = {
        "a": lambda: DT.minhash_lsh_candidates(corpus, n_shingle=3),
        "b": shingle_sets,
        "c": full,
    }
    build = builders[stage]

    # fixture-touching read-path warm scan (uniform with the sweep)
    R.load_table(spark, sf_dir, "documents").select(
        F.sum(F.length("text"))).collect()

    noop(build())  # warm: JIT of the stage's own generated code
    spark._jvm.System.gc()
    time.sleep(2)
    t0 = time.time()
    noop(build())
    row: dict = {"stage": stage, "t_s": round(time.time() - t0, 2)}
    if stage in ("a", "c"):
        row["n_rows"] = build().count()
    print(json.dumps(row))
    return 0


def main(sf_dir: str) -> int:
    out: dict = {"sf_dir": sf_dir,
                 "isolation": "one subprocess (fresh JVM) per stage"}
    for stage, t_key, n_key in (("a", "a_candidates_s", "n_candidates"),
                                ("b", "b_shingle_sets_s", None),
                                ("c", "c_full_s", "n_pairs")):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage",
             sf_dir, stage],
            capture_output=True, text=True, timeout=STAGE_TIMEOUT_S,
            env=os.environ.copy(), cwd=REPO,
        )
        if p.returncode != 0:
            exc = [ln.strip() for ln in p.stderr.splitlines()
                   if "Exception" in ln or "Error" in ln][:4]
            out[t_key] = None
            out[f"{stage}_error"] = f"rc={p.returncode} {exc!r}"[:300]
            print(json.dumps(out))
            return 1
        row = None
        for ln in reversed(p.stdout.strip().splitlines()):
            try:
                row = json.loads(ln)
                break
            except ValueError:
                continue
        out[t_key] = row["t_s"]
        if n_key:
            out[n_key] = row.get("n_rows")
        print(f"stage {stage}: {row}", flush=True)
    out["residual_joins_s"] = round(
        out["c_full_s"] - out["a_candidates_s"]
        - 2 * out["b_shingle_sets_s"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--stage":
        raise SystemExit(run_stage(sys.argv[2], sys.argv[3]))
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else os.path.join(REPO, "_artifacts",
                                            "organic_sf10")))
