#!/bin/bash
# Measurement queue for when the axon TPU tunnel returns (it went down
# ~21:00 Aug 17 during round 3, leaving several landed features unmeasured
# on-chip — NOTES.md "Round-3 outcome summary").  Run from the repo root:
#
#     bash misc/on_chip_return.sh [outdir]
#
# Order matters: the suite first (correctness gate + warms the persistent
# compile cache), then the headline bench, then the decision measurements
# (windowed-fetch A/B -> default flip decision), then the trace for the
# ~30 ms formatting/misc tail attribution.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/on_chip_r3}
mkdir -p "$OUT"

echo "== 1/5 TPU suite (warm cache ~6.5 min, cold ~17 min) =="
timeout 2400 python -m pytest tests/ -x -q 2>&1 | tail -5 | tee "$OUT/suite.txt"

echo "== 2/5 bench (headline + secondaries) =="
timeout 3600 python bench.py 2> "$OUT/bench.err" | tee "$OUT/bench.json"

echo "== 3/5 windowed-fetch A/B (default-flip decision) =="
# (ab_windowed_fetch.py removed in r4 with the windowed feature fetch)

echo "== 3b/5 default-vs-tuned knob A/B (runtime_checks cost) =="
timeout 1800 python misc/ab_knobs.py 2>&1 | tee "$OUT/ab_knobs.txt"

echo "== 4/5 stage breakdown =="
timeout 1800 python misc/profile_step.py --caps 2>&1 | tee "$OUT/profile.txt"

echo "== 5/5 profiler trace (tail attribution) =="
timeout 1800 python misc/trace.py 2>&1 | tail -20 | tee "$OUT/trace.txt"

echo "DONE -> $OUT"
