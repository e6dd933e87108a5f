"""Round-12 per-query profiler (r11 tool, plans dir -> plans/r12): timing breakdown + plan capture.

For each named catalog query, in ONE shared bench-like session:

  * ``t_build``  — builder() wall (Python plan construction + py4j),
  * ``t_rep1/2/3`` — noop-forced executions (rep1 ≈ the bench's number),
  * ``n_jobs``   — Spark jobs triggered by rep 1 (statusTracker delta),
  * plan dump    — ``explain("formatted")`` → plans/r12/<name>_before.txt
    (or ``_after.txt`` with --after).

Prints one JSON line per query and a total. Usage::

    python tools/profile_r12.py q_semantic_dedup_autok q_ann_ivf ...
    python tools/profile_r12.py --top 25            # slowest from BENCH_r10
    python tools/profile_r12.py --after q_ann_ivf   # capture _after plans
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _top_from_record(n: int) -> list[str]:
    with open(os.path.join(REPO, "_artifacts", "bench_full.json")) as f:
        b = json.load(f)
    qs = {k: v for k, v in b["queries"].items() if v >= 0}
    return sorted(qs, key=lambda k: -qs[k])[:n]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--after" in args:
        args.remove("--after")
        suffix = "_after"
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    names: list[str] = []
    if args and args[0] == "--top":
        names = _top_from_record(int(args[1]))
    else:
        names = args
    if not names:
        print("usage: profile_r12.py [--after] [--reps N] "
              "(--top N | name...)", file=sys.stderr)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from real_big_data_project_spark.plans import queries_map
    from real_big_data_project_spark.session import get_spark

    spark = get_spark("rbds-profile-r12")
    sc = spark.sparkContext
    qmap = queries_map()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # Warmup identical to bench.py
    force(qmap["q_scan_parquet"](spark, sf_dir))
    if any("stream" in n for n in names):
        from real_big_data_project_spark.streaming.drain import warm_streaming
        warm_streaming(spark)

    plans_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    rows = []
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        samples = []
        for r in range(reps):
            r0 = time.perf_counter()
            force(df if r == 0 else qmap[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - r0, 4))
            if r == 0:
                jobs_after = len(
                    sc.statusTracker().getJobIdsForGroup(None) or [])
            spark._jvm.System.gc()
        # Plan capture AFTER execution (AQE final plan state where shown).
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        row = {
            "query": name,
            "t_build": round(t_build, 4),
            "reps": samples,
            "n_jobs_rep1": jobs_after - jobs_before,
            "n_exchanges": plan.count("Exchange"),
            "plan_ops": plan.count("\n(")
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        sc.setJobDescription(None)
    total1 = sum(r["reps"][0] for r in rows)
    tmin = sum(min(r["reps"]) for r in rows)
    print(json.dumps({"n": len(rows), "sum_rep1": round(total1, 3),
                      "sum_min": round(tmin, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
