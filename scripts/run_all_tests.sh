#!/usr/bin/env bash
# Full tiered test run WITH committed evidence artifacts: fast tier first
# (fails fast, writes TESTS_r{N}.txt), then the slow tier (multi-process
# equivalence, reference loop parity, e2e rehearsal — writes
# TESTS_SLOW_r{N}.txt). The plain `pytest` default is the fast tier only
# (pyproject.toml addopts).
#
# Usage: scripts/run_all_tests.sh [round_number]
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-05}
scripts/run_fast_tier.sh "$N"
scripts/run_slow_tier.sh "$N"
