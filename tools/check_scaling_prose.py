#!/usr/bin/env python3
"""Warn when SCALING.md's latest round section quotes run values that no
longer appear in bench_scale100x.json (VERDICT r14 #3: the st04_100x
bullet said "[20.6, 20.3]" while the shipped artifact's row was
[13.603, 22.865, 24.224, 13.405] — the artifact was refreshed after the
prose was written and the prose never followed; hand-written claims about
machine-checked artifacts drifting is exactly the failure mode the
generated bench_summary.md exists to prevent).

Scope and rule (kept deliberately narrow so retired-history quotes do not
false-positive): only the LAST "## Round N" section is scanned; within it,
each paragraph that names an artifact row key (e.g. st04_100x) and quotes
one or more bracketed numeric lists must have AT LEAST ONE of those lists
whose every number matches (to 1-decimal prose rounding) a value in that
row's current runs_s. A paragraph quoting only stale lists warns. Warnings
only (exit 0) — prose drift is a documentation bug, not an evidence-bar
failure; tools/check_scale.py forwards these notes.
"""
import json
import re
import sys

TOL = 0.051  # 1-decimal prose rounding of an artifact value


def last_round_section(md):
    heads = [m for m in re.finditer(r"^## Round (\d+)", md, re.M)]
    if not heads:
        return ""
    last = max(heads, key=lambda m: int(m.group(1)))
    nxt = re.search(r"^## ", md[last.end():], re.M)
    end = last.end() + nxt.start() if nxt else len(md)
    return md[last.start():end]


def bracketed_lists(text):
    out = []
    for m in re.finditer(r"\[([0-9][0-9.,\s]*)\]", text):
        try:
            vals = [float(x) for x in m.group(1).split(",") if x.strip()]
        except ValueError:
            continue
        if vals:
            out.append((m.start(), vals))
    return out


def matches(vals, runs):
    return all(any(abs(v - r) <= TOL for r in runs) for v in vals)


def check(md_path="SCALING.md", art_path="bench_scale100x.json"):
    md = open(md_path).read()
    art = json.load(open(art_path))
    rows = art.get("rows", {})
    section = last_round_section(md)
    notes = []
    # paragraphs = blank-line-separated blocks, and each top-level bullet
    # is its own paragraph (bullets are consecutive lines in SCALING.md)
    for para in re.split(r"\n\s*\n|\n(?=- )", section):
        mentions = sorted((m.start(), k) for k in rows
                          for m in re.finditer(re.escape(k), para))
        lists = bracketed_lists(para)
        if not mentions or not lists:
            continue
        # attribute each bracketed list to the NEAREST PRECEDING row-key
        # mention — one bullet often discusses several rows in sequence,
        # and a list belongs to the row it follows
        per_key = {}
        for pos, vals in lists:
            prior = [(p, k) for p, k in mentions if p < pos]
            if prior:
                per_key.setdefault(max(prior)[1], []).append(vals)
        for k, klists in per_key.items():
            runs = rows[k].get("runs_s", [])
            if not runs:
                continue
            if not any(matches(vals, runs) for vals in klists):
                notes.append(
                    f"SCALING.md latest round quotes run values for {k} "
                    f"({klists}) but none match the artifact's current "
                    f"runs_s {runs} - re-sync the prose with the artifact")
    return notes


def main():
    md_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.md"
    art_path = sys.argv[2] if len(sys.argv) > 2 else "bench_scale100x.json"
    notes = check(md_path, art_path)
    for n in notes:
        print("note:", n)
    if not notes:
        print("SCALING.md prose matches the scale artifact "
              "(latest round section, bracketed run lists)")


if __name__ == "__main__":
    main()
