"""sf1.0 robustness sweep: bit-exactness + scaling behavior one decade up.

For EVERY catalog query — streaming included since round 4 — run the
Spark plan at sf0.1 and at the synthetic sf1.0 (tools/make_sf1.py),
check the sf1.0 result against its DuckDB oracle, and record the time
ratio. With 10x the rows, a healthy plan's time ratio stays well under
~10 (fixed costs amortize); a superlinear ratio flags a plan that would
not survive the next decade.

Streaming queries drain the 10x source through the normal availableNow
foreachBatch drain: their ratios mix the fixed per-stream machinery
(scale-independent, see PERF_NOTES) with state-volume-proportional work,
so expect sublinear ratios for the agg family and near-linear for the
state-heavy dedup/join. warm_streaming runs untimed first.

Writes one JSON report to _artifacts/sweep_sf1.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF01 = os.environ.get("SWEEP_BASE_SF", "/root/testdata/sf0.1")
SF1 = os.environ.get("SWEEP_SF1_DIR", os.path.join(REPO, "_artifacts", "sf1.0"))
OUT = os.path.join(REPO, "_artifacts", "sweep_sf1.json")

# DuckDB-side closure over pair graphs is quadratic-ish in replica count
# for WITH RECURSIVE; cap nothing by default but allow opt-out via env.
SKIP = set(filter(None, os.environ.get("SWEEP_SKIP", "").split(",")))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sweep-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from real_big_data_project_spark.plans import catalog as C
    from real_big_data_project_spark.plans.oracle_check import check_query

    C._load_all()
    from real_big_data_project_spark.streaming.drain import warm_streaming

    warm_streaming(spark)
    report: dict[str, dict] = {}
    mismatches, errors, superlinear = [], [], []
    names = [n for n in C.QUERIES if n not in SKIP]
    print(f"sweeping {len(names)} queries: {SF01} -> {SF1}")
    for i, name in enumerate(names):
        spec = C.QUERIES[name]
        row: dict = {}
        try:
            def _force(df):
                # noop writer, not .count() — count() eliminates marker
                # joins and under-prices e.g. q_doc_fingerprint (round 9)
                df.write.format("noop").mode("overwrite").save()

            t0 = time.time()
            _force(spec.builder(spark, SF01))
            row["t_sf01"] = round(time.time() - t0, 2)
            t0 = time.time()
            _force(spec.builder(spark, SF1))
            row["t_sf1"] = round(time.time() - t0, 2)
            row["rows_sf1"] = spec.builder(spark, SF1).count()
            row["ratio"] = round(row["t_sf1"] / max(row["t_sf01"], 0.05), 1)
            if spec.oracle is not None:
                t0 = time.time()
                res = check_query(spark, name, SF1)
                row["oracle_s"] = round(time.time() - t0, 2)
                row["ok"] = bool(res.ok)
                row["bit_equal"] = bool(res.values_bit_equal)
                if not res.ok:
                    mismatches.append(name)
                    row["detail"] = res.detail[:300]
            else:
                row["ok"] = n_rows >= 0
                row["rows_only"] = True
            if row["ratio"] > 15:
                superlinear.append(name)
        except Exception as exc:  # noqa: BLE001 — record and continue
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
            errors.append(name)
        report[name] = row
        status = row.get("error") or ("OK" if row.get("ok") else "MISMATCH")
        print(f"[{i + 1}/{len(names)}] {name}: sf0.1 {row.get('t_sf01')}s "
              f"sf1.0 {row.get('t_sf1')}s x{row.get('ratio')} {status}",
              flush=True)

    summary = {
        "n": len(names),
        "mismatches": mismatches,
        "errors": errors,
        "superlinear_gt15x": superlinear,
    }
    with open(OUT, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(json.dumps(summary))
    return 1 if (mismatches or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
