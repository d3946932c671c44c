#!/usr/bin/env bash
# Fast test tier with a committed evidence artifact (VERDICT r3 item 4):
# runs `pytest -q` (the not-slow tier) and writes TESTS_r{N}.txt at the repo
# root with the summary line, wall time, and the 15 slowest tests.
#
# Usage: scripts/run_fast_tier.sh [round_number]
set -uo pipefail
cd "$(dirname "$0")/.."
N=${1:-04}
OUT="TESTS_r${N}.txt"
unset PYTHONPATH PALLAS_AXON_POOL_IPS || true
T0=$(date +%s)
python -m pytest tests/ -q --durations=15 2>&1 | tail -40 > /tmp/fast_tier.out
RC=$?
T1=$(date +%s)
{
  echo "fast tier (pytest -q, not-slow) — $(date -u +%FT%TZ)"
  echo "wall_time_s: $((T1 - T0))   rc: $RC"
  echo "host: $(nproc) cpu core(s); XLA backend opt level 0 (conftest)"
  echo "---"
  cat /tmp/fast_tier.out
} > "$OUT"
cat "$OUT" | tail -5
exit $RC
