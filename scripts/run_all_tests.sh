#!/usr/bin/env bash
# Full tiered test run: fast tier first (fails fast), then the slow tier
# (multi-process equivalence, full-geometry RAD-DINO conversion, e2e loops).
# The plain `pytest` default is the fast tier only (pyproject.toml addopts).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q "$@"
python -m pytest tests/ -x -q -m slow "$@"
