#!/usr/bin/env python3
"""Compute the next round's driver-gate rotation prefix (catalog._RISKIEST).

The driver's correctness gate samples the FIRST 50 entries of
``queries()``; the prefix must therefore lead with (a) queries added or
output-changed this round — a prior green row does not certify new
output — then (b) the least-recently-gated queries, so every catalog
entry is periodically re-proven on current-generation testdata.

This tool mechanizes (b): it unions every CORRECTNESS_r*.json in the repo
root, ranks each query by the round of its latest green row (never-gated
first, then oldest), and prints a ready-to-paste prefix. Pass new/changed
query names as argv to pin them ahead of the staleness ranking:

    python tools/gen_rotation.py q_new_this_round q_output_changed
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE = 50  # the driver's correctness-gate sample size


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        if m is None:  # glob is looser than the name pattern
            continue
        rnd = int(m.group(1))
        for q, r in json.load(open(f)).items():
            ok = (r.get("rows_match") and r.get("schema_match")
                  and r.get("hash_match") in (True, None))
            # rows-only queries (no oracle) count as gated when they ran
            if r.get("err") == "no_oracle" and r.get("spark_rows", -1) >= 0:
                ok = True
            if ok:
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def main() -> int:
    from real_big_data_project_spark.plans import queries_map

    pinned = [a for a in sys.argv[1:]]
    allq = list(queries_map())
    unknown = [p for p in pinned if p not in allq]
    if unknown:
        print(f"ERROR: pinned names not in the catalog: {unknown}",
              file=sys.stderr)
        return 1
    green = latest_green()
    rest = [q for q in allq if q not in pinned]
    # never-gated first (round 0), then oldest green row; name tiebreak
    rest.sort(key=lambda q: (green.get(q, 0), q))
    prefix = (pinned + rest)[:SAMPLE]
    print(f"# rotation prefix ({len(prefix)} of {len(allq)} queries; "
          f"staleness from {len(green)} gated)")
    print("_RISKIEST: tuple[str, ...] = (")
    for q in prefix:
        rnd = green.get(q)
        note = f"  # last green r{rnd:02d}" if rnd else "  # never gated"
        print(f'    "{q}",{note}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
