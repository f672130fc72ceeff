#!/usr/bin/env bash
# One-command re-derivation of a round's claims (VERDICT r9 #8): the
# correctness gate (sf0.01 + DuckDB oracle compare), the ScalaTest suite,
# the leak scan, and a budget-capped bench. The bench regenerates
# bench_full.json / bench_summary.md in place and the leak scan rewrites
# LEAKCHECK.json, so `git diff` at the end shows exactly how the re-run
# differs from the committed evidence.
#
# Usage: tools/repro.sh            # full re-derivation (~15 min)
#   SKIP_BENCH=1 tools/repro.sh    # correctness + tests + leak scan only
set -euo pipefail
cd "$(dirname "$0")/.."
SF01=${SF01:-/root/testdata/sf0.01}
SF1=${SF1:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/graft_repro}

echo "== 1/4 correctness: graft.Verify @ $SF01 + DuckDB oracle compare =="
sbt -batch "runMain graft.Verify $SF01 $OUT/verify"
python3 tools/check.py "$OUT/verify" "$SF01"

echo "== 2/4 ScalaTest suite =="
sbt -batch test

echo "== 2.5/4 scale-evidence bars (bench_scale100x.json) =="
# no Spark needed: asserts every committed 100x row is a measurement, not
# an upper bound (>= 2 gated runs, max task < 5 s, load < 4, per-row stamp)
python3 tools/check_scale.py bench_scale100x.json

echo "== 2.6/4 SCALING.md prose vs scale artifact (r15) =="
# warns when the latest round section quotes run values absent from the
# committed artifact — the drift class that hit the r14 st04 bullet
python3 tools/check_scaling_prose.py

echo "== 2.7/4 round-over-round baseline discipline (r16) =="
# fails when the published delta table compares against a baseline from
# THIS round (the r15 self-reference) or a mis-stamped baseline file
python3 tools/check_baseline_round.py

echo "== 3/4 leak scan (rewrites LEAKCHECK.json) =="
# keep the committed round number unless the caller overrides it — a
# hardcoded default would silently rewrite the artifact's round field
ROUND="${ROUND:-$(python3 -c "import json;print(json.load(open('LEAKCHECK.json'))['round'])")}"
python3 tools/leakcheck.py "$ROUND"

if [ -z "${SKIP_BENCH:-}" ]; then
  echo "== 4/4 bench (budget-capped; rewrites bench_full.json / bench_summary.md) =="
  SPARK_GRAFT_SF_DIR="$SF1" \
    SPARK_GRAFT_BENCH_BUDGET_S="${BENCH_BUDGET:-2400}" \
    sbt -batch 'runMain graft.Bench'
else
  echo "== 4/4 bench skipped (SKIP_BENCH set) =="
fi

echo "== artifact drift vs committed evidence =="
git --no-pager diff --stat LEAKCHECK.json bench_full.json bench_summary.md || true
echo "repro complete"
