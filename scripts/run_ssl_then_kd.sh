#!/usr/bin/env bash
# SSL pretrain → teacher → student KD pipeline (reference: run.sh flow).
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS=${RUNS:-runs/pipeline}

python -m multimodal_edema_prediction_tpu.cli.train_ssl \
    --batch_size 512 --epochs 3 --ckpt_dir "$RUNS/ssl" "$@"
SSL_CKPT=$(ls -t "$RUNS"/ssl/*/pretrain-*.msgpack | head -1)

python -m multimodal_edema_prediction_tpu.cli.train_teacher \
    --duett_ckpt "$SSL_CKPT" --ckpt_dir "$RUNS/teacher" "$@"
TEACHER_CKPT=$(ls -t "$RUNS"/teacher/*/best-*.msgpack | head -1)

python -m multimodal_edema_prediction_tpu.cli.train_student \
    --teacher_ckpt "$TEACHER_CKPT" --duett_ckpt "$SSL_CKPT" \
    --kd_T 4.0 --kd_alpha 0.5 --ckpt_dir "$RUNS/student" "$@"
