#!/usr/bin/env bash
# Teacher training launcher (reference: run_duett.sh). On TPU there is no
# accelerate-launch process fan-out: one python process drives the whole
# mesh via GSPMD.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m multimodal_edema_prediction_tpu.cli.train_teacher \
    --perceiver_type dual_patch \
    --batch_size 128 --lr 8e-5 --backbone_lr_mult 0.2 \
    --weight_decay 5e-2 --epochs 30 --warmup_steps 300 --patience 5 \
    --mixed_precision bf16 \
    "$@"
