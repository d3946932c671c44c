#!/usr/bin/env bash
# Trajectory-probe launcher with a pre-flight smoke gate
# (reference: run_trajectory_local.sh runs the CPU smoke test before training).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[pre-flight] trajectory encoder smoke test"
python -m pytest tests/test_trajectory.py -q

python -m multimodal_edema_prediction_tpu.analysis.train_trajectory_probe "$@"
