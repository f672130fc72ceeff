#!/usr/bin/env python3
"""Round-over-round baseline discipline (VERDICT r15 #2): the published
delta table must compare THIS round against a baseline from a STRICTLY
EARLIER round. r15 shipped a "+1.8 %" table whose committed baseline had
been regenerated mid-r15 (with early-r15 values), making every published
delta self-referential; the honest r14->r15 figure lived only in a commit
message.

The fix is structural — graft.Bench writes per-round baseline files
(bench_norm_r{N}.json, each stamped "round": N) and compares against the
newest file with round < N — and this checker makes the structure a gate:

  - current round N = max committed BENCH_r{n}.json + 1 (the driver writes
    BENCH_r{N}.json only when round N ends, so every in-round run agrees);
  - every bench_norm_r{K}.json must carry "round": K (a mis-stamped file
    is exactly the self-reference hazard coming back);
  - if this round's bench ran (bench_norm_r{N}.json exists), bench_full
    .json must stamp the same round and a baseline_round < N, and
    bench_summary.md's round-over-round heading must cite
    "round {N} vs round {baseline_round}";
  - the comparison target bench_norm_r{baseline_round}.json must exist
    unless baseline_round is -1 (first round under the scheme, no table).

Exit 0 only when the discipline holds.
"""
import json
import os
import re
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    os.chdir(root)
    bad = []
    bench_rounds = [int(m.group(1)) for f in os.listdir(".")
                    if (m := re.fullmatch(r"BENCH_r0*(\d+)\.json", f))]
    current = max(bench_rounds, default=0) + 1
    norm_files = {int(m.group(1)): f for f in os.listdir(".")
                  if (m := re.fullmatch(r"bench_norm_r0*(\d+)\.json", f))}
    for k, f in sorted(norm_files.items()):
        stamped = json.load(open(f)).get("round")
        if stamped != k:
            bad.append(f"{f} stamps round {stamped!r}, filename says {k}")
    if current not in norm_files:
        print(f"note: round {current} has no bench_norm_r{current}.json yet "
              "(bench not run this round) - nothing more to check")
    else:
        expected_prev = max((k for k in norm_files if k < current),
                            default=-1)
        try:
            full = json.load(open("bench_full.json"))
        except Exception as e:
            full = {}
            bad.append(f"bench_full.json unreadable ({e})")
        if full:
            if full.get("round") != current:
                bad.append(f"bench_full.json round {full.get('round')!r} != "
                           f"current round {current} (stale artifact - "
                           "regenerate)")
            bl = full.get("baseline_round")
            if bl is None or bl >= current:
                bad.append(f"bench_full.json baseline_round {bl!r} is not "
                           f"strictly earlier than round {current} - "
                           "SELF-REFERENTIAL comparison")
            elif bl != expected_prev:
                bad.append(f"bench_full.json baseline_round {bl} != newest "
                           f"earlier baseline on disk ({expected_prev})")
            if bl is not None and bl >= 0:
                md = open("bench_summary.md").read() \
                    if os.path.exists("bench_summary.md") else ""
                want = f"(round {current}) vs round {bl}"
                if want not in md:
                    bad.append("bench_summary.md round-over-round heading "
                               f"does not cite '{want}' - summary and "
                               "artifact drifted")
    if bad:
        print("baseline round discipline FAILS:")
        for b in bad:
            print(" -", b)
        sys.exit(1)
    print(f"baseline round discipline OK: round {current}, "
          f"{len(norm_files)} per-round baseline file(s), every stamp "
          "matches its filename, comparison target strictly earlier")


if __name__ == "__main__":
    main()
