"""One-off FULL-catalog oracle pass at the driver's gate scale (sf0.01).

VERDICT r10 ask #8 (stretch): the driver's per-round gate samples 50 of
the catalog's queries, so a cohort's "latest green proof" can age several
rounds even though the query is re-proven locally by every pytest run.
This tool retires the vintage question outright: it runs EVERY registered
catalog query through the same comparator the driver uses
(plans/oracle_check.py::check_query — row count + column names +
order-insensitive value compare, bit-equal flagged separately) at
/root/testdata/sf0.01, and commits the result as a supplementary record
the judge can audit beside CORRECTNESS_r{N}.json:

    python tools/full_oracle_pass.py          # -> _artifacts/oracle_full.json

Queries without an oracle (the genuinely non-SQL-expressible ops) are
recorded with ``"oracle": null`` and a rows-only execution check —
exactly the weaker check the driver records for them.

One shared session, driver-like config (local[32], 32 shuffle
partitions, AQE on) plus the hostile non-UTC timezone the stress suite
uses — a pass here is strictly stronger than the driver's sampled gate.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "_artifacts", "oracle_full.json")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("full-oracle-pass")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        # the stress suite's hostile session timezone: a query whose
        # result depends on the session zone fails HERE, not at a
        # driver whose zone we don't control
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from real_big_data_project_spark.plans import catalog as C
    from real_big_data_project_spark.plans.oracle_check import check_query

    C._load_all()
    names = sorted(C.QUERIES)
    rows: dict[str, dict] = {}
    n_ok = n_bit = n_rows_only = 0
    t_start = time.time()
    for i, name in enumerate(names):
        spec = C.QUERIES[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                n = spec.builder(spark, SF_DIR).count()
                rows[name] = {"oracle": None, "rows": n, "ok": True,
                              "s": round(time.time() - t0, 2)}
                n_rows_only += 1
                n_ok += 1
            else:
                res = check_query(spark, name, SF_DIR)
                rows[name] = {
                    "ok": bool(res.ok),
                    "bit_equal": bool(res.values_bit_equal),
                    "s": round(time.time() - t0, 2),
                }
                if not res.ok:
                    rows[name]["detail"] = res.detail[:300]
                n_ok += bool(res.ok)
                n_bit += bool(res.values_bit_equal)
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"ok": False,
                          "detail": f"{type(exc).__name__}: {exc}"[:300],
                          "s": round(time.time() - t0, 2)}
        status = rows[name]
        print(f"[{i + 1}/{len(names)}] {name}: "
              f"{'ok' if status['ok'] else 'FAIL'} ({status['s']}s)",
              flush=True)
    record = {
        "sf_dir": SF_DIR,
        "session_timezone": "America/New_York",
        "comparator": "plans/oracle_check.py::check_query (the driver "
                      "gate's comparator: rows + columns + "
                      "order-insensitive values; bit_equal flagged)",
        "n": len(names),
        "n_ok": n_ok,
        "n_bit_equal": n_bit,
        "n_rows_only": n_rows_only,
        "failures": sorted(n for n, r in rows.items() if not r["ok"]),
        "wall_s": round(time.time() - t_start, 1),
        "queries": rows,
    }
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "queries"}))
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main())
