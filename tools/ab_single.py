"""Matched-warmth paired single-query A/B across two checked-out trees.

VERDICT r11 item 3: q_pagerank read 0.80 and q_semantic_dedup 0.90 in the
driver's cold-JVM single-rep record; both are suspected noise (q_pagerank's
code is untouched since r10). This tool settles it with the builder's own
protocol: `bench.py --single <q>` (fresh JVM, warmup query off the clock)
run from TWO worktrees (e.g. the r10 verdict commit vs HEAD), legs
alternating A/B/A/B in one contention window, fixed-work probe per leg.

    python tools/ab_single.py /root/r10tree /root/repo q_pagerank 3

Output: one JSON line per leg + a min-summary; caller commits the record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


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


def _leg(tree: str, query: str) -> float | None:
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--single", query],
        capture_output=True, text=True, timeout=600,
        env=os.environ.copy(), cwd=tree,
    )
    for ln in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(ln).get("sec")
        except ValueError:
            continue
    print(f"leg failed rc={p.returncode}: {p.stderr.strip()[-300:]}",
          file=sys.stderr)
    return None


def main() -> int:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    query = sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    legs = []
    for r in range(rounds):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            row = {"round": r, "label": label, "tree": tree,
                   "probe_s": _probe(), "sec": _leg(tree, query)}
            legs.append(row)
            print(json.dumps(row), flush=True)
    mins = {
        lab: min(r["sec"] for r in legs if r["label"] == lab and r["sec"])
        for lab in ("A", "B")
    }
    print(json.dumps({"query": query, "min": mins,
                      "ratio_B_over_A": round(mins["B"] / mins["A"], 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
