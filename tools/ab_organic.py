"""Round-12 paired A/B of the bench's ORGANIC leg under env-toggled confs.

The round-11 verdict's item 1: the shingle pipelines became map-only up
to their first aggregate, so they run at FILE-SPLIT parallelism, and the
organic corpus is a single 14.8 MB file → ~4 tasks at any core count
(maxSplitBytes = max(openCostInBytes=4MB, bytes/cores)). This tool prices
a conf fix (e.g. SPARK_GRAFT_OPEN_COST_BYTES) with the protocol the
round-11 evidence used: both legs of a pair run back-to-back in one
contention window, each leg in its OWN subprocess (fresh JVM — the
bench's own organic-leg child), alternating A/B/A/B, with a fixed-work
probe per leg so drift is visible in the record.

    python tools/ab_organic.py '{"A": {"SPARK_GRAFT_OPEN_COST_BYTES": "4194304"}, "B": {}}' 2

Output: one JSON line per leg + _artifacts/r12/ab_organic.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "_artifacts", "r12", "ab_organic.json")
LEG_TIMEOUT_S = 1800


def _probe() -> float:
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


def _leg(env_over: dict) -> dict:
    env = os.environ.copy()
    env.update(env_over)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--organic-leg"],
        capture_output=True, text=True, timeout=LEG_TIMEOUT_S,
        env=env, cwd=REPO,
    )
    if p.returncode != 0:
        return {"error": f"rc={p.returncode}: {p.stderr.strip()[-400:]}"}
    for ln in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(ln)
        except ValueError:
            continue
    return {"error": "no JSON in child stdout"}


def main() -> int:
    variants: dict = json.loads(sys.argv[1])
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    record: dict = {"variants": variants, "legs": []}
    for r in range(rounds):
        for label, env_over in variants.items():
            row = {"round": r, "label": label, "probe_s": _probe()}
            t0 = time.time()
            row["leg"] = _leg(env_over)
            row["wall_s"] = round(time.time() - t0, 2)
            record["legs"].append(row)
            print(json.dumps(row), flush=True)
    # min per (label, query) across rounds — the paired summary
    summary: dict = {}
    for row in record["legs"]:
        leg = row.get("leg") or {}
        for q, v in (leg.get("queries") or {}).items():
            if v < 0:
                continue
            cur = summary.setdefault(q, {}).get(row["label"])
            summary[q][row["label"]] = v if cur is None else min(cur, v)
        if "total" in leg:
            cur = summary.setdefault("_total", {}).get(row["label"])
            summary["_total"][row["label"]] = (
                leg["total"] if cur is None else min(cur, leg["total"])
            )
    record["summary_min"] = summary
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"summary_min": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
