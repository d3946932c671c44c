#!/usr/bin/env bash
# One-command end-to-end rehearsal (VERDICT r3 item 8): the full real-data
# pipeline executed on a synthetic raw MIMIC-style layout —
#   raw CSVs -> cli/preprocess (L0, six-notebook chain) -> synthetic JPEGs
#   -> CXR linear head -> SSL pretrain -> fused teacher (real-JPEG tier,
#   pretrained head) -> student KD -> 2 analysis CLIs
# and a manifest diff of the produced artifact tree against the expected
# list (scripts/e2e_manifest.txt — mirrors the reference's output surface,
# SURVEY.md §2.2/§2.3). On real-data day, point stage 1 at the actual
# MIMIC-IV/MIMIC-CXR download and drop the synthetic stages.
#
# Usage: scripts/e2e_rehearsal.sh [workdir]        (~10-20 min on 1 CPU core)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/e2e_rehearsal}
export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
# drop any site-injected TPU relay plugin (it overrides JAX_PLATFORMS at
# import time and can hang CPU runs on a busy/down tunnel)
unset PYTHONPATH PALLAS_AXON_POOL_IPS || true
PY="python"
rm -rf "$WORK"; mkdir -p "$WORK"

echo "=== [1/8] synthetic raw MIMIC-IV + MIMIC-CXR layout ==="
$PY -m multimodal_edema_prediction_tpu.data.synthetic_raw \
    --out "$WORK/raw" --n_subjects 24

echo "=== [2/8] L0 preprocess (six-notebook chain) ==="
$PY -m multimodal_edema_prediction_tpu.cli.preprocess \
    --raw_root "$WORK/raw" --out_dir "$WORK/artifacts"

echo "=== [3/8] synthetic JPEGs for the produced catalog ==="
$PY -m multimodal_edema_prediction_tpu.data.synthetic_raw \
    --out "$WORK/jpegs" --jpegs_for "$WORK/artifacts"

COMMON=(--data_dir "$WORK/artifacts" --batch_size 16 --warmup_steps 4
        --d_embedding 8 --n_duett_layers 1 --d_latent 32
        --n_perceiver_heads 2 --head_hidden 16)

echo "=== [4/8] CXR linear head (frozen tiny ViT, real JPEGs) ==="
$PY -m multimodal_edema_prediction_tpu.cli.train_cxr_head \
    --data_dir "$WORK/artifacts" --cxr_jpeg_root "$WORK/jpegs" \
    --vit_size tiny --epochs 2 --batch_size 16 \
    --ckpt_dir "$WORK/cxr_head"

echo "=== [5/8] SSL pretrain (sliding windows over the cohort) ==="
$PY -m multimodal_edema_prediction_tpu.cli.train_ssl \
    "${COMMON[@]}" --epochs 2 --limit_batches 4 \
    --ckpt_dir "$WORK/ssl"
SSL_CKPT=$(ls "$WORK"/ssl/*/pretrain-*.msgpack | head -1)

echo "=== [6/8] fused teacher (dual_patch, JPEG tier, SSL backbone) ==="
$PY -m multimodal_edema_prediction_tpu.cli.train_teacher \
    "${COMMON[@]}" --vit_size tiny --epochs 2 --limit_batches 4 \
    --cxr_jpeg_root "$WORK/jpegs" --duett_ckpt "$SSL_CKPT" \
    --ckpt_dir "$WORK/teacher"
TEACHER_CKPT=$(ls "$WORK"/teacher/*/best-*.msgpack | head -1)

echo "=== [7/8] student KD from the teacher ==="
$PY -m multimodal_edema_prediction_tpu.cli.train_student \
    "${COMMON[@]}" --teacher_ckpt "$TEACHER_CKPT" \
    --epochs 2 --limit_batches 4 --ckpt_dir "$WORK/student"

echo "=== [8/8] analysis CLIs against the trained teacher ==="
$PY -m multimodal_edema_prediction_tpu.analysis.complementarity \
    --ckpt "$TEACHER_CKPT" --data_dir "$WORK/artifacts" \
    --cxr_jpeg_root "$WORK/jpegs" --out_dir "$WORK/analysis/complementarity"
$PY -m multimodal_edema_prediction_tpu.analysis.diagnose_temporal_usage \
    --ckpt "$TEACHER_CKPT" --data_dir "$WORK/artifacts" \
    --cxr_jpeg_root "$WORK/jpegs" --out_dir "$WORK/analysis/temporal_usage"

echo "=== manifest diff vs scripts/e2e_manifest.txt ==="
# normalize: strip workdir, collapse timestamped run dirs and numbered files
( cd "$WORK" && find . -type f ! -name manifest_actual.txt | sed -E \
      -e 's#^\./##' \
      -e 's#(teacher|student|ssl|cxr_head)/[0-9]{8}_[0-9]{6}[^/]*/#\1/RUN/#' \
      -e 's#best-step[0-9]+-[0-9.]+\.msgpack#best-STEP.msgpack#' \
      -e 's#pretrain-step[0-9]+-[0-9.]+\.msgpack#pretrain-STEP.msgpack#' \
      -e 's#/[0-9]+\.jpg#/N.jpg#' -e 's#raw/.*#raw/...#' \
      | sort -u ) > "$WORK/manifest_actual.txt"
if [[ "${REGEN_MANIFEST:-}" == "1" ]]; then
    cp "$WORK/manifest_actual.txt" scripts/e2e_manifest.txt
    echo "manifest regenerated -> scripts/e2e_manifest.txt"
else
    diff scripts/e2e_manifest.txt "$WORK/manifest_actual.txt" \
        || { echo "ARTIFACT MANIFEST DRIFT (see diff above)"; exit 1; }
    echo "artifact manifest matches ($(wc -l < "$WORK/manifest_actual.txt") entries)"
fi
echo "E2E REHEARSAL OK: $WORK"
