#!/usr/bin/env python3
"""Validate bench_scale100x.json against the scale-row evidence bars
(VERDICT r10 #6 — turn the measurement discipline into a machine check):
a published 100x row must be a real measurement, not an upper bound.

The expected-row list is read from the artifact's own "expected_rows"
field, which graft.Scale100x emits from Bench.scale100xTargets (VERDICT
r11 #5 — single registry; adding a row in Scala gets it bar-checked here
without touching this file). MIN_ROWS is the tamper floor: deleting rows
from the Scala registry shrinks expected_rows below it and fails.

Bars, per expected row:
  - present, and not an error row;
  - runs_s carries >= 2 wall times (two gated runs; single-run rows are
    exactly what r10 published for d13/d07 under loadavg 9.9/12.6);
  - published sec is the WARM MEDIAN of runs_s — the arithmetic median of
    runs 2..N (all runs when only one exists; even counts average the two
    middles), recomputed here and matched against the row's "sec" and its
    "pub":"warm_median" stamp (VERDICT r15 #4 — min-of-N picks over
    2.5-3.6x spreads were flattering, not representative);
  - max_task_ms < 5000 (SCALING.md's straggler bar). Since r16 the row's
    max_task_ms is the MIN over its runs of the per-run max task
    (max_task_ms_per_run carries the full list): a hot partition is
    structural and stretches the same task on EVERY run, while a
    hypervisor throttle pocket stretches a random task on a random run —
    min-over-runs estimates the structural property this bar checks;
  - load < 4.0 (quiet-machine bar);
  - a per-row "unix" stamp (rows merged from a pre-r11 artifact lack it
    and must be re-measured);
  - for compute-dense rows (task_s/cores > 10 s): wall <= 2x the
    core-bound floor task_s/cores (VERDICT r11 #2 — the extra wall must
    be scheduling slack, never wasted work; s07's 49 s is 1.11x its
    44 s floor).

Exit 0 only when every bar holds — repro.sh runs this so a round cannot
re-derive cleanly with contaminated scale evidence.
"""
import json
import sys

MIN_ROWS = 17  # r15: r14's 16 + q57 (composed partition+z-order write/read)
MAX_TASK_MS = 5000
MAX_LOAD = 4.0
MAX_WALL_OVER_CORE = 2.0
CORE_FLOOR_GATE_S = 10.0
DEFAULT_CORES = 32  # rows measured before r12 carry no "cores" field


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_scale100x.json"
    art = json.load(open(path))
    rows = art.get("rows", {})
    expected = art.get("expected_rows")
    if not expected:
        print("artifact has no expected_rows field (pre-r12) - re-measure "
              "at least one row with graft.Scale100x to stamp it")
        sys.exit(1)
    bad = []
    # the producer stamps its merge-time bars into the artifact; the two
    # languages duplicating these constants must not silently diverge
    # (ADVICE r14) - drift is an evidence bug, so it FAILS, not warns
    mb = art.get("merge_bars")
    if mb and (mb.get("max_task_ms") != MAX_TASK_MS or
               mb.get("max_load") != MAX_LOAD):
        bad.append(f"artifact merge_bars {mb} differ from checker bars "
                   f"(max_task_ms={MAX_TASK_MS}, max_load={MAX_LOAD}) - "
                   "Scale100x.MaxTaskMs/MaxLoad and check_scale.py drifted")
    if len(expected) < MIN_ROWS:
        bad.append(f"expected_rows lists {len(expected)} rows, floor is "
                   f"{MIN_ROWS} - rows were deleted from the registry")
    for k in expected:
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
        # warm-median publishing rule (VERDICT r15 #4), recomputed from the
        # row's own runs_s — the Scala publisher and this checker must agree
        if r.get("pub") != "warm_median":
            bad.append(f"{k}: pub is {r.get('pub')!r}, bar is 'warm_median' "
                       "- row predates the r16 publishing rule; re-measure")
        elif runs:
            warm = sorted(runs[1:] if len(runs) >= 2 else runs)
            want = (warm[len(warm) // 2] if len(warm) % 2 == 1 else
                    (warm[len(warm) // 2 - 1] + warm[len(warm) // 2]) / 2)
            if abs(r.get("sec", -1.0) - want) > 0.005:
                bad.append(f"{k}: sec {r.get('sec')} is not the warm median "
                           f"{want:.3f} of runs_s[1:] {runs}")
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
        # task-second accounting (derived from committed fields so rows
        # measured before the wall_over_core field exist are still barred)
        task_s = r.get("task_s", 0.0)
        floor_s = task_s / r.get("cores", DEFAULT_CORES)
        if floor_s > CORE_FLOOR_GATE_S:
            ratio = r.get("sec", 0.0) / floor_s
            if ratio > MAX_WALL_OVER_CORE:
                bad.append(f"{k}: wall {r.get('sec')} s is {ratio:.2f}x the "
                           f"core-bound floor {floor_s:.1f} s, bar is <= "
                           f"{MAX_WALL_OVER_CORE} - scheduling waste")
    for k in expected:
        r = rows.get(k) or {}
        try:
            steal = float(r.get("steal_pct", ""))
        except (TypeError, ValueError):
            steal = None
        # advisory, not a bar: hypervisor steal is environment, not engine,
        # but a best-run taken at high steal understates the engine —
        # re-measure when the host quiets (r12: loadavg gates can't see it)
        if steal is not None and steal > 5.0:
            print(f"note: {k} best run saw {steal}% hypervisor CPU steal - "
                  "wall is an upper bound; re-measure on a quieter host")
        # r13: per-run machine-speed probe (single-thread cal kernel,
        # M rows/s; clean bare-JVM box ~23, and ~15-18 is typical right
        # after a quiet gate releases at loadavg ~2). Like steal, advisory
        # not a bar - but a PUBLISHED (best) run whose pre-run cal sat far
        # below clean speed was measured on a degraded machine window and
        # its wall is an upper bound.
        # r14: spread advisory (VERDICT r13 #2) — a published best whose own
        # runs_s history holds a >3x slower run says "this op sometimes runs
        # far slower and the row doesn't say why". Advisory, not a bar: the
        # published value still met every bar, but the row should either be
        # re-measured quiet or carry attribution (steal / cal_mrows_per_run /
        # st_batches+st_state_rows / cc_rounds) naming the slow runs' cause.
        runs = r.get("runs_s", [])
        sec = r.get("sec")
        if runs and sec and max(runs) > 3.0 * sec:
            # r14: self-attribution via per-run task-seconds. The engine's
            # work is deterministic, so when the slow runs' OWN task-seconds
            # inflate roughly in step with their walls, the tasks themselves
            # ran slower on a throttled host window - machine, not operator.
            # Only when slow walls come with ~flat task-seconds is the
            # spread unexplained (scheduling/GC/driver stall) and worth a
            # re-measure.
            task_runs = r.get("task_s_per_run", [])
            attributed = False
            # operator-driven extra work ALSO inflates task-seconds (an
            # extra CC round, a different auto operating point, extra
            # stream batches), so inflated task-seconds alone cannot name
            # the machine (ADVICE r14). Machine attribution now requires:
            # (a) per-run work counters identical across runs (when the row
            #     carries any), so the work itself did not grow; and
            # (b) the slow runs' own pre-run cal probe well below the best
            #     run's - the direct machine-speed corroboration.
            work_counters = [r.get(f) for f in
                             ("cc_rounds", "st_batches", "st_state_rows")]
            same_work = all(
                w is None or (isinstance(w, list) and len(set(map(str, w))) <= 1)
                for w in work_counters)
            if task_runs and len(task_runs) == len(runs):
                best_i = runs.index(min(runs))
                base_task = task_runs[best_i]
                slow_is = [i for i, w in enumerate(runs) if w > 3.0 * sec]
                cals = r.get("cal_mrows_per_run", [])
                cal_corroborates = bool(
                    cals and len(cals) == len(runs) and cals[best_i] > 0 and
                    all(cals[i] < 0.8 * cals[best_i] for i in slow_is))
                if (base_task > 0 and slow_is and same_work and
                        cal_corroborates and all(
                            task_runs[i] > 1.5 * base_task for i in slow_is)):
                    attributed = True
                    print(f"note: {k} spread [{min(runs)}..{max(runs)}] is "
                          "machine-attributed: the slow runs' own "
                          f"task-seconds ({[task_runs[i] for i in slow_is]} "
                          f"vs {base_task} on the best run) inflate with "
                          "the wall AND their pre-run cal sat well below "
                          "the best run's - throttled host window, not "
                          "operator variance")
            if not attributed and all(w <= 3.0 * sec for w in runs[1:]):
                # only run #1 is slow: the cold-start SHAPE. But shape alone
                # is not attribution (ADVICE r15: the unconditioned branch
                # auto-excused any front-loaded spread, including operator
                # variance on run 1 or a contended window during it) - the
                # label needs the same corroboration the machine branch
                # demands: identical per-run work counters, run-1's OWN
                # task-seconds inflated (cold IO/JIT runs INSIDE tasks),
                # and run-1's pre-run cal probe healthy (>= 80% of the best
                # run's - cold disk is not a throttled host).
                cals = r.get("cal_mrows_per_run", [])
                best_i = runs.index(min(runs)) if runs else 0
                corroborated = (
                    same_work and task_runs and len(task_runs) == len(runs)
                    and task_runs[best_i] > 0
                    and task_runs[0] > 1.5 * task_runs[best_i]
                    and cals and len(cals) == len(runs)
                    and cals[best_i] > 0
                    and cals[0] >= 0.8 * cals[best_i])
                if corroborated:
                    attributed = True
                    print(f"note: {k} spread [{min(runs)}..{max(runs)}] is "
                          "the corroborated first-run cold-start pattern "
                          "(same per-run work, run-1 task-seconds "
                          f"{task_runs[0]} vs {task_runs[best_i]} warm with "
                          "a healthy run-1 cal probe: cold corpus IO + JIT "
                          "inside the tasks) - published value is a warm "
                          "median, as a resident production corpus would "
                          "see")
                else:
                    print(f"note: {k} spread [{min(runs)}..{max(runs)}] has "
                          "the cold-start SHAPE (only run #1 slow) but no "
                          "corroboration (work counters / run-1 "
                          "task-seconds / run-1 cal do not all line up) - "
                          "re-measure quiet or attribute via the per-run "
                          "fields")
            if not attributed:
                print(f"note: {k} runs_s spread [{min(runs)}..{max(runs)}] "
                      f"vs published {sec} (> 3x) - re-measure quiet or "
                      "attribute the slow runs via the per-run fields")
        cals = r.get("cal_mrows_per_run", [])
        if cals and runs and len(cals) == len(runs):
            best_cal = cals[runs.index(min(runs))]
            if best_cal < 0.55 * 23.0:
                print(f"note: {k} published run's pre-run cal was "
                      f"{best_cal} M rows/s (clean ~23) - measured on a "
                      "degraded machine window; wall is an upper bound")
    for k in sorted(rows):
        if k not in expected:
            print(f"note: extra row {k} (not bar-checked)")
    # prose-vs-artifact drift (VERDICT r14 #3): forward the sibling
    # checker's notes when SCALING.md sits next to the artifact
    try:
        import os
        md = os.path.join(os.path.dirname(os.path.abspath(path)), "SCALING.md")
        if os.path.exists(md):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import check_scaling_prose
            for n in check_scaling_prose.check(md, path):
                print("note:", n)
    except Exception as e:  # advisory only - never fail the bars on it
        print(f"note: prose check skipped ({e})")
    if bad:
        print("scale100x artifact FAILS the evidence bars:")
        for b in bad:
            print(" -", b)
        sys.exit(1)
    print(f"scale100x artifact OK: {len(expected)} rows, >=2 runs each, "
          f"max task < {MAX_TASK_MS} ms, load < {MAX_LOAD}, wall <= "
          f"{MAX_WALL_OVER_CORE}x core floor on compute-dense rows")


if __name__ == "__main__":
    main()
