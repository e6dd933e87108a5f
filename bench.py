#!/usr/bin/env python3
"""Benchmark harness — times every registered catalog query end-to-end.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the ``noop`` writer so the whole plan executes
JVM-side (no Python/Arrow transfer in the timed path, and — unlike
``count()`` — no column pruning of the projected output). A warmup query
runs first so JVM/codegen startup is not charged to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    return float(m.group(1)) if m else -1.0


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from real_big_data_project_spark.plans import queries_map
    from real_big_data_project_spark.session import get_spark

    spark = get_spark("rbds-bench")
    qmap = queries_map()

    # Warmup: JVM + parquet footer reads off the clock.
    force(qmap["q_scan_parquet"](spark, sf_dir))

    timings: dict[str, float] = {}
    failed: list[str] = []
    total = 0.0
    for name in sorted(qmap):
        t0 = time.perf_counter()
        try:
            force(qmap[name](spark, sf_dir))
            dt = time.perf_counter() - t0
        except Exception as exc:  # a broken query must not sink the bench...
            dt = time.perf_counter() - t0
            print(f"bench: {name} FAILED after {dt:.2f}s: {exc}", file=sys.stderr)
            timings[name] = -1.0
            failed.append(name)
            continue
        timings[name] = round(dt, 4)
        total += dt
        # Untimed GC barrier: without it, heap debt from allocation-heavy
        # queries (shingle sets, collect_list) lands as GC pauses inside
        # whichever query runs NEXT — per-query isolation, not a speedup.
        spark._jvm.System.gc()

    # ...but it must not make the headline metric look FASTER either:
    # a failure reads as the full bench timeout, never as saved time.
    if failed:
        total += 600.0 * len(failed)
    print(json.dumps({
        "metric": "catalog_total_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "failed": failed,
        "sf": _sf_from_dir(sf_dir),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
