"""Bounded streaming experiment (VERDICT r11 item 7): A/B the state-store
provider (HDFSBacked default vs RocksDB) over the 6 streaming queries.

One fresh-JVM subprocess per (variant, round); inside, warm_streaming +
one untimed warm pass per query, then a timed noop-forced pass — the
bench's own protocol. Legs alternate in one window.

    python tools/ab_streaming.py 2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ("q_stream_stream_join", "q_streaming_dedup", "q_streaming_ohlcv",
           "q_streaming_sessions", "q_streaming_stateful_pct",
           "q_streaming_enrich")
ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def run_leg(provider: str) -> int:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from real_big_data_project_spark import session as S
    n = S.default_parallelism()
    b = (SparkSession.builder.master(f"local[{n}]").appName("stream-ab")
         .config("spark.sql.shuffle.partitions", str(n))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config(S.NANOS_AS_LONG, "true")
         .config(S.OBJ_AGG_FALLBACK, S.OBJ_AGG_FALLBACK_KEYS)
         .config(S.OPEN_COST, S.OPEN_COST_BYTES)
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g"))
    if provider:
        b = b.config("spark.sql.streaming.stateStore.providerClass", provider)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from real_big_data_project_spark.plans import queries_map
    from real_big_data_project_spark.streaming.drain import warm_streaming
    qmap = queries_map()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_streaming(spark)
    out = {}
    for q in QUERIES:
        if q not in qmap:
            continue
        qmap[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        qmap[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[q] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"provider": provider or "default", "queries": out,
                      "total": round(sum(out.values()), 3)}))
    return 0


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    legs = []
    for r in range(rounds):
        for label, prov in (("default", ""), ("rocksdb", ROCKSDB)):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", prov],
                capture_output=True, text=True, timeout=900,
                env=os.environ.copy(), cwd=REPO)
            line = "{}"
            for ln in reversed(p.stdout.strip().splitlines()):
                try:
                    json.loads(ln)
                    line = ln
                    break
                except ValueError:
                    continue
            row = {"round": r, "label": label, "leg": json.loads(line),
                   "rc": p.returncode}
            if p.returncode != 0:
                row["stderr"] = p.stderr.strip()[-300:]
            legs.append(row)
            print(json.dumps(row), flush=True)
    out = os.path.join(REPO, "_artifacts", "r12", "ab_streaming.json")
    with open(out, "w") as f:
        json.dump({"legs": legs}, f, indent=1)
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--leg":
        raise SystemExit(run_leg(sys.argv[2] if len(sys.argv) > 2 else ""))
    raise SystemExit(main())
