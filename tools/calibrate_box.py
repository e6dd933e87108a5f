"""10-second host-speed probe: detects hypervisor contention drift.

Round 11 found the box's effective speed varies ~4-7x across hours
(dmesg `hrtimer: interrupt took 17.9ms`, vmstat steal 4-5%: the HOST
de-schedules our vCPUs under co-tenant load). Sweep RATIOS survive —
both legs of a pick run in the same contention window — but absolute
seconds compared across windows (e.g. this round's numbers vs round
10's records) need this probe's factor attached.

Prints one JSON line: single-core and 24-thread fixed-work timings.
Run it before/after a sweep; the pair bounds the window's drift.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _work(seed: int) -> float:
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((512, 512))
    b = rng.standard_normal((512, 512))
    s = 0.0
    for _ in range(40):
        s += float((a @ b)[0, 0])
    return s


def main() -> int:
    t0 = time.time()
    _work(0)
    single = round(time.time() - t0, 3)
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=24) as ex:
        list(ex.map(_work, range(24)))
    multi = round(time.time() - t0, 3)
    print(json.dumps({"ts": time.strftime("%H:%M:%S"),
                      "single_core_s": single, "mt24_s": multi}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
