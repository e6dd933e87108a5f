"""Shared driver for the isolated (subprocess-per-pick) scale sweeps.

Both sweep tools (sweep_sf10.py, sweep_organic.py) run every pick in a
fresh JVM so localCheckpoint blocks and GC debt from one pick can never
inflate another (PERF_NOTES round 7: the shared-session sweeps measured
the same leg at 8 s and 54 s across quiet runs). The per-pick TIMING
policy stays in each tool's `run_single`; this module owns the parent
protocol — spawn, parse, account, record — so a protocol fix cannot
land in one sweep and silently miss the other.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def parse_row(stdout: str) -> dict:
    """The child prints its result row as a JSON object on the LAST line
    it controls — but a library or atexit hook can append stray stdout
    after it, so scan backwards for the first parseable JSON object
    instead of trusting lines[-1] (a stray line must not convert a
    completed multi-minute pick into an error row)."""
    for ln in reversed([ln for ln in stdout.strip().splitlines() if ln]):
        try:
            row = json.loads(ln)
        except ValueError:
            continue
        if isinstance(row, dict):
            return row
    raise RuntimeError("no JSON row found in child stdout")


def drive_picks(
    script: str,
    picks: tuple[tuple[str, bool], ...],
    out_path: str,
    ratio_flag: float,
    timeout_s: int,
    summary_extra: dict | None = None,
    sf1_label: str = "sf1",
    resume: bool = False,
    carried_require: tuple[str, ...] = (),
) -> int:
    """Run every (name, want_oracle) pick as `script --single name 0|1`,
    collect rows, flag ratios above `ratio_flag`, write the record, and
    return non-zero if any pick mismatched or errored.

    The record is rewritten after EVERY pick with ``"complete": false``
    until the sweep finishes: a sweep killed mid-run (wall-clock budget,
    machine reboot) must not leave a prior run's STALE record in place
    presenting itself as current — exactly how the round-7
    superlinear list survived round 8 unrefreshed (VERDICT r8 Wrong 1).

    ``resume=True`` reloads an interrupted record and re-runs only the
    picks without a CLEAN prior row (missing, errored, or mismatched):
    the sf100 legs run minutes each, so a sweep killed at pick 5/7 should
    pay for picks 6–7, not the whole multi-hour pass again. Carried rows
    are re-accounted against the CURRENT pick list, so a carried error
    row still fails the sweep until its pick re-runs clean."""
    report: dict[str, dict] = {}
    mismatches: list[str] = []
    errors: list[str] = []
    superlinear: list[str] = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(script)))

    carried: dict[str, dict] = {}
    if resume and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("queries", {})
        names = {name for name, _ in picks}
        carried = {
            n: r for n, r in prior.items()
            if n in names and "error" not in r and r.get("ok") is not False
            # a row from a PRIOR protocol vintage (missing a column the
            # current protocol emits) re-runs instead of being carried —
            # a resumed sweep must not mix timing protocols in one record
            # (VERDICT r9 Wrong 1)
            and all(k in r for k in carried_require)
        }

    def _write(complete: bool) -> dict:
        summary = {
            "n": len(picks),
            "n_run": len(report),
            "complete": complete,
            "isolation": "one subprocess (fresh JVM) per pick",
            **(summary_extra or {}),
            "mismatches": mismatches,
            "errors": errors,
            f"superlinear_gt{int(ratio_flag)}x": superlinear,
        }
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "queries": report}, f, indent=1)
        return summary

    for i, (name, want_oracle) in enumerate(picks):
        row: dict = {}
        if name in carried:
            row = carried[name]
            if row.get("ratio", 0) > ratio_flag:
                superlinear.append(name)
            report[name] = row
            _write(complete=False)
            print(f"[{i + 1}/{len(picks)}] {name}: carried from prior run",
                  flush=True)
            continue
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(script),
                 "--single", name, "1" if want_oracle else "0"],
                capture_output=True, text=True, timeout=timeout_s,
                env=os.environ.copy(), cwd=repo,
            )
            if p.returncode != 0:
                # Spark buries the real cause thousands of lines above the
                # progress-bar tail — surface the exception lines
                # themselves, not whatever 300 chars happened to be last
                # (the round-9 sf100 ngram failure's tail was all
                # stage-progress redraws).
                exc_lines = [
                    ln.strip() for ln in p.stderr.splitlines()
                    if ("Exception" in ln or "Error" in ln
                        or ln.startswith("Caused by"))
                ][:6]
                raise RuntimeError(
                    f"rc={p.returncode} exc={exc_lines!r} "
                    f"tail={p.stderr.strip()[-200:]!r}")
            row = parse_row(p.stdout)
        except Exception as exc:  # noqa: BLE001 — record and continue
            row["error"] = f"{type(exc).__name__}: {exc}"[:300]
            errors.append(name)
        if row.get("ok") is False:
            mismatches.append(name)
        if row.get("ratio", 0) > ratio_flag:
            superlinear.append(name)
        report[name] = row
        _write(complete=False)
        status = row.get("error") or (
            "MISMATCH" if name in mismatches else "OK")
        legs = " ".join(f"{k}={row[k]}s" for k in sorted(row)
                        if k.startswith("t_"))
        print(f"[{i + 1}/{len(picks)}] {name}: {legs or sf1_label} "
              f"x{row.get('ratio')} {status}", flush=True)
    summary = _write(complete=True)
    print(json.dumps(summary))
    return 1 if (mismatches or errors) else 0
