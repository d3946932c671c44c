#!/usr/bin/env bash
# Slow test tier with a committed evidence artifact (VERDICT r4 item 4):
# the ~80 slow tests hold the crown jewels — reference loop-level parity
# (tests/test_trainer_loop_parity.py et al.), 2-proc multihost preemption
# (tests/test_multihost_2proc.py), the e2e rehearsal, and the full-geometry
# RAD-DINO conversion — and until r5 they passed without any per-round
# trace. Writes TESTS_SLOW_r{N}.txt at the repo root with the summary line,
# wall time, and the 15 slowest tests.
#
# Usage: scripts/run_slow_tier.sh [round_number]     (~60-90 min, 1 core)
set -uo pipefail
cd "$(dirname "$0")/.."
N=${1:-05}
OUT="TESTS_SLOW_r${N}.txt"
unset PYTHONPATH PALLAS_AXON_POOL_IPS || true
T0=$(date +%s)
python -m pytest tests/ -q -m slow --durations=15 2>&1 | tail -40 \
    > /tmp/slow_tier.out
RC=$?
T1=$(date +%s)
{
  echo "slow tier (pytest -q -m slow) — $(date -u +%FT%TZ)"
  echo "wall_time_s: $((T1 - T0))   rc: $RC"
  echo "host: $(nproc) cpu core(s); XLA backend opt level 0 (conftest)"
  echo "---"
  cat /tmp/slow_tier.out
} > "$OUT"
cat "$OUT" | tail -5
exit $RC
