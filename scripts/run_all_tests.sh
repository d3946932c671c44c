#!/usr/bin/env bash
# Full tiered test run WITH committed evidence artifacts: fast tier first
# (fails fast, writes TESTS_r{N}.txt), then the slow tier (multi-process
# equivalence, reference loop parity, e2e rehearsal — writes
# TESTS_SLOW_r{N}.txt). The plain `pytest` default is the fast tier only
# (pyproject.toml addopts).
#
# Usage: scripts/run_all_tests.sh [round_number]
# (Pre-r5 this script forwarded its args to pytest; the round number must
#  be numeric so a stale `run_all_tests.sh -k foo` invocation fails loudly
#  instead of writing TESTS_r-k.txt and running the full suite.)
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:-05}
if ! [[ "$N" =~ ^[0-9]+$ ]]; then
    echo "usage: scripts/run_all_tests.sh [round_number]" >&2
    echo "(for pytest filters, call pytest directly: pytest -q $*)" >&2
    exit 2
fi
scripts/run_fast_tier.sh "$N"
scripts/run_slow_tier.sh "$N"
