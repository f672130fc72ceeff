#!/usr/bin/env python3
"""Validate bench_scale100x.json against the scale-row evidence bars
(VERDICT r10 #6 — turn the measurement discipline into a machine check):
a published 100x row must be a real measurement, not an upper bound.

Bars, per expected row:
  - present, and not an error row;
  - runs_s carries >= 2 wall times (two gated runs; single-run rows are
    exactly what r10 published for d13/d07 under loadavg 9.9/12.6);
  - max_task_ms < 5000 (SCALING.md's straggler bar);
  - load < 4.0 (quiet-machine bar);
  - a per-row "unix" stamp (rows merged from a pre-r11 artifact lack it
    and must be re-measured).

Exit 0 only when every bar holds — repro.sh runs this so a round cannot
re-derive cleanly with contaminated scale evidence.
"""
import json
import sys

EXPECTED = [
    "d03_100x", "d03auto_100x", "d13_100x", "s07_100x",
    "d10_100x", "d07_100x", "d21_100x",
]
MAX_TASK_MS = 5000
MAX_LOAD = 4.0


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_scale100x.json"
    art = json.load(open(path))
    rows = art.get("rows", {})
    bad = []
    for k in EXPECTED:
        r = rows.get(k)
        if r is None:
            bad.append(f"{k}: MISSING")
            continue
        if "error" in r:
            bad.append(f"{k}: error row ({r['error']})")
            continue
        runs = r.get("runs_s", [])
        if len(runs) < 2:
            bad.append(f"{k}: {len(runs)} measured run(s), bar is >= 2")
        if r.get("max_task_ms", 10**9) >= MAX_TASK_MS:
            bad.append(f"{k}: max task {r['max_task_ms']} ms, bar is < {MAX_TASK_MS}")
        try:
            load = float(r.get("load", "nan"))
        except (TypeError, ValueError):
            load = float("nan")
        if not (load < MAX_LOAD):
            bad.append(f"{k}: load '{r.get('load')}', bar is < {MAX_LOAD}")
        if "unix" not in r:
            bad.append(f"{k}: no per-row unix stamp (carried from a pre-r11 "
                       "artifact) - re-measure")
    for k in sorted(rows):
        if k not in EXPECTED:
            print(f"note: extra row {k} (not bar-checked)")
    if bad:
        print("scale100x artifact FAILS the evidence bars:")
        for b in bad:
            print(" -", b)
        sys.exit(1)
    print(f"scale100x artifact OK: {len(EXPECTED)} rows, >=2 runs each, "
          f"max task < {MAX_TASK_MS} ms, load < {MAX_LOAD}")


if __name__ == "__main__":
    main()
