"""Round-12 organic-corpus profiler: per-query wall + executor CPU +
shuffle/spill bytes (status REST API) + formatted plan dumps.

Same session the bench's organic leg uses (get_spark confs) EXCEPT the UI
is enabled — the REST metrics are the instrument that survives this box's
hypervisor contention (r11 protocol). One untimed warm pass per query,
then a timed noop-forced pass bracketed by metric snapshots.

    python tools/profile_organic.py [--sf-dir D] [--suffix _before] q_x q_y
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _metrics_snapshot(spark) -> dict:
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    data = json.load(urllib.request.urlopen(url, timeout=30))
    tot = {"cpu_s": 0.0, "run_s": 0.0, "shuffle_write_gb": 0.0,
           "spill_mem_gb": 0.0, "spill_disk_gb": 0.0, "n_tasks": 0}
    for st in data:
        tot["cpu_s"] += st.get("executorCpuTime", 0) / 1e9
        tot["run_s"] += st.get("executorRunTime", 0) / 1e3
        tot["shuffle_write_gb"] += st.get("shuffleWriteBytes", 0) / 1e9
        tot["spill_mem_gb"] += st.get("memoryBytesSpilled", 0) / 1e9
        tot["spill_disk_gb"] += st.get("diskBytesSpilled", 0) / 1e9
        tot["n_tasks"] += st.get("numCompleteTasks", 0)
    return tot


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.path.join(REPO, "_artifacts", "organic_sf1")
    suffix = ""
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    names = args

    os.environ["SPARK_GRAFT_UI"] = "1"
    from pyspark.sql import SparkSession

    from real_big_data_project_spark import session as S

    # get_spark's confs with the UI forced on (REST metrics).
    n = S.default_parallelism()
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("rbds-profile-organic")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(S.NANOS_AS_LONG, "true")
        .config(S.OBJ_AGG_FALLBACK, S.OBJ_AGG_FALLBACK_KEYS)
        .config(S.OPEN_COST, S.OPEN_COST_BYTES)
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from real_big_data_project_spark.plans import queries_map
    import bench as B

    qmap = queries_map()
    plans_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        builder = B.ORGANIC_OVERRIDES.get(name, qmap[name])
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        t_build = time.perf_counter() - t0
        if name not in B.ORGANIC_SINGLE_PASS:
            force(df)                      # warm
            spark._jvm.System.gc()
            df = builder(spark, sf_dir)
        pre = _metrics_snapshot(spark)
        t0 = time.perf_counter()
        force(df)
        wall = time.perf_counter() - t0
        post = _metrics_snapshot(spark)
        row = {"query": name, "t_build": round(t_build, 3),
               "wall_s": round(wall, 3)}
        for k in post:
            row[k] = round(post[k] - pre[k], 3)
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
        if suffix:
            with open(os.path.join(plans_dir,
                                   f"{name}_organic{suffix}.txt"), "w") as f:
                f.write(plan)
        row["n_exchanges"] = plan.count("Exchange")
        row["n_sorts"] = plan.count("Sort ")
        row["plan_ops"] = plan.count("\n(")
        print(json.dumps(row), flush=True)
        spark._jvm.System.gc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
