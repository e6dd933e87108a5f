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

    python tools/diag_ngram_stages.py  # both decades, stage-major

Prints one JSON line (also _artifacts/diag_ngram.json): per-stage
seconds + decade ratio + candidate/pair counts, with a fixed-work
contention probe per leg. A superlinear stage-A ratio localizes the
x13.4 to the band shuffle, stage-B to the doc-key shuffle's spill
curve, and a full-query ratio well above all stage ratios to the
verification joins.
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
        # UI stays ON here (sweeps disable it): the status REST API is
        # this tool's primary instrument — see _metrics_snapshot.
        .config("spark.ui.enabled", "true")
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

    # ONE plan-cold timed pass — the sweep's own sf100 protocol. The
    # first cut warmed each stage's plan then timed a second pass and
    # counted a third: at the sf100 full query that overlaps multiple
    # ~60 GB shuffle footprints (the documented ENOSPC mechanism the
    # sweep's single-pass rule exists for), and a WARM number can't
    # decompose the record's COLD t_sf100 anyway. Row counts come from
    # the sweep record (candidates/pairs measured exactly linear:
    # 332,352 -> 3,323,879 and 332,347 -> 3,323,459) — not worth a
    # second corpus-scale execution per stage here.
    #
    # PRIMARY INSTRUMENT: executor CPU time + shuffle/spill bytes from
    # the status REST API, snapshot-diffed around the timed pass. The
    # third protocol cut, after two wall-clock cuts both produced
    # physically impossible records on this box (stage B timing ABOVE
    # the full query that contains it; a strict-subset plan above its
    # superset) — the hypervisor de-schedules our vCPUs in multi-minute
    # bursts (calibrate_box measured 8-17x probe drift), and a burst
    # inside any one leg poisons every wall-clock comparison. CPU time
    # does not accumulate while a vCPU is de-scheduled and is additive
    # across plans, so per-stage decade ratios AND the C - A - 2B
    # residual survive contention; spill bytes directly test the
    # "doc-key shuffle spill curve" hypothesis the flag named.
    pre = _metrics_snapshot(spark)
    t0 = time.time()
    noop(build())
    row: dict = {"stage": stage, "t_s": round(time.time() - t0, 2)}
    post = _metrics_snapshot(spark)
    for k in post:
        row[k] = round(post[k] - pre[k], 2)
    print(json.dumps(row))
    return 0


def _metrics_snapshot(spark) -> dict:
    """Totals over completed stages from the status REST API (v1)."""
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url, timeout=30))
    tot = {"cpu_s": 0.0, "run_s": 0.0, "input_gb": 0.0,
           "shuffle_write_gb": 0.0, "shuffle_read_gb": 0.0,
           "spill_mem_gb": 0.0, "spill_disk_gb": 0.0}
    for st in data:
        tot["cpu_s"] += st.get("executorCpuTime", 0) / 1e9
        tot["run_s"] += st.get("executorRunTime", 0) / 1e3
        tot["input_gb"] += st.get("inputBytes", 0) / 1e9
        tot["shuffle_write_gb"] += st.get("shuffleWriteBytes", 0) / 1e9
        tot["shuffle_read_gb"] += st.get("shuffleReadBytes", 0) / 1e9
        tot["spill_mem_gb"] += st.get("memoryBytesSpilled", 0) / 1e9
        tot["spill_disk_gb"] += st.get("diskBytesSpilled", 0) / 1e9
    return tot


def _probe() -> float:
    """Fixed-work single-core probe (calibrate_box's kernel): measures
    the hypervisor-contention window a stage ran in."""
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 512))
    b = rng.standard_normal((512, 512))
    t0 = time.time()
    s = 0.0
    for _ in range(40):
        s += float((a @ b)[0, 0])
    assert s == s
    return round(time.time() - t0, 3)


def _run_one(sf_dir: str, stage: str) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stage",
         sf_dir, stage],
        capture_output=True, text=True, timeout=STAGE_TIMEOUT_S,
        env=os.environ.copy(), cwd=REPO,
    )
    if p.returncode != 0:
        exc = [ln.strip() for ln in p.stderr.splitlines()
               if "Exception" in ln or "Error" in ln][:4]
        return {"error": f"rc={p.returncode} {exc!r}"[:300]}
    for ln in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(ln)
        except ValueError:
            continue
    return {"error": "no JSON line in child stdout"}


def main(sf10: str, sf100: str) -> int:
    """STAGE-MAJOR pairing (second cut, round 11). The first cut ran
    A, B, C at one scale per invocation; on this box the hypervisor
    contention window drifts ~2x WITHIN such a run (measured: stage A
    172 s in a single_core=2.1 s window, stage C — a strict superset
    plan — 104 s in a 1.3 s window), so the within-scale additive
    model C - A - 2B priced contention drift, not the joins. What the
    x13.4 flag actually needs is the per-stage DECADE ratio, so run
    the two scales of the SAME stage back-to-back — the sweep's own
    both-legs-one-window pairing — and attach a fixed-work probe per
    leg so any residual drift is visible in the record."""
    out: dict = {
        "sf10": sf10, "sf100": sf100,
        "isolation": "one subprocess (fresh JVM) per (stage, scale); "
                     "scales of a stage paired back-to-back in one "
                     "contention window",
        "stages": {},
    }
    for stage, label in (("a", "candidates"), ("b", "shingle_sets"),
                         ("c", "full_query")):
        row: dict = {"label": label}
        for scale, d in (("sf10", sf10), ("sf100", sf100)):
            row[f"probe_{scale}_s"] = _probe()
            r = _run_one(d, stage)
            if "error" in r:
                row[f"{scale}_error"] = r["error"]
                out["stages"][stage] = row
                print(json.dumps(out))
                return 1
            for k, v in r.items():
                if k != "stage":
                    row[f"{scale}_{k}"] = v
        row["cpu_ratio"] = round(row["sf100_cpu_s"] / row["sf10_cpu_s"], 2)
        row["wall_ratio"] = round(row["sf100_t_s"] / row["sf10_t_s"], 2)
        out["stages"][stage] = row
        print(f"stage {stage} ({label}): {row}", flush=True)
    st = out["stages"]
    for scale in ("sf10", "sf100"):
        out[f"residual_joins_{scale}_cpu_s"] = round(
            st["c"][f"{scale}_cpu_s"] - st["a"][f"{scale}_cpu_s"]
            - 2 * st["b"][f"{scale}_cpu_s"], 2)
    out["note"] = ("cpu_s (executor CPU, additive, immune to vCPU "
                   "de-scheduling) carries the attribution: per-stage "
                   "cpu_ratio across the decade + the C - A - 2B "
                   "residual per scale; wall seconds and probes are "
                   "kept to show the contention the CPU columns factor "
                   "out")
    print(json.dumps(out))
    with open(os.path.join(REPO, "_artifacts", "diag_ngram.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--stage":
        raise SystemExit(run_stage(sys.argv[2], sys.argv[3]))
    _d = os.path.join(REPO, "_artifacts")
    raise SystemExit(main(
        sys.argv[1] if len(sys.argv) > 1
        else os.path.join(_d, "organic_sf10"),
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(_d, "organic_sf100")))
