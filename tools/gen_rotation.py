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

The committed prefix is CHECKED, not advisory: ``catalog._ROTATION_VINTAGE``
records the newest CORRECTNESS round the prefix was generated from, and
``tests/test_plans.py::test_rotation_prefix_is_generated`` recomputes
``compute_prefix(catalog._PINNED)`` against the live CORRECTNESS files.
The moment the driver lands a new CORRECTNESS_r{N}.json, the recomputation
shifts and the test FAILS until the prefix is regenerated — a round can no
longer silently re-prove the identical 50 (VERDICT r8 item 1).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SAMPLE = 50  # the driver's correctness-gate sample size


def latest_green() -> dict[str, int]:
    """name -> round of the latest green driver row, unioned over all rounds."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
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


def newest_round() -> int:
    """The highest round number among CORRECTNESS_r*.json files present."""
    rounds = [int(m.group(1))
              for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
              if (m := re.search(r"_r(\d+)\.json$", f))]
    return max(rounds, default=0)


def compute_prefix(pinned: tuple[str, ...] = ()) -> list[str]:
    """The 50-slot gate prefix: pinned first, then least-recently-gated.

    Deterministic given the catalog and the CORRECTNESS_r*.json set, so the
    committed ``catalog._RISKIEST`` can be asserted equal to this.
    """
    from real_big_data_project_spark.plans import queries_map

    allq = list(queries_map())
    unknown = [p for p in pinned if p not in allq]
    if unknown:
        raise ValueError(f"pinned names not in the catalog: {unknown}")
    green = latest_green()
    rest = [q for q in allq if q not in pinned]
    # never-gated first (round 0), then oldest green row; name tiebreak
    rest.sort(key=lambda q: (green.get(q, 0), q))
    return (list(pinned) + rest)[:SAMPLE]


def main() -> int:
    pinned = tuple(sys.argv[1:])
    try:
        prefix = compute_prefix(pinned)
    except ValueError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 1
    green = latest_green()
    from real_big_data_project_spark.plans import queries_map
    print(f"# rotation prefix ({len(prefix)} of {len(queries_map())} "
          f"queries; staleness from {len(green)} gated)")
    print(f"_ROTATION_VINTAGE = {newest_round()}")
    print(f"_PINNED: tuple[str, ...] = {pinned!r}")
    print("_RISKIEST: tuple[str, ...] = (")
    for q in prefix:
        rnd = green.get(q)
        note = f"  # last green r{rnd:02d}" if rnd else "  # never gated"
        print(f'    "{q}",{note}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
