#!/usr/bin/env bash
# Eval-only with qualitative dumps (reference scripts/validate_visualize.sh).
set -euo pipefail
python -m cli.validate \
  --version "${LLAVA_DIR:?set LLAVA_DIR}" \
  --dinov2_ckpt "${DINOV2_CKPT:?set DINOV2_CKPT}" \
  --resume_ckpt "${CKPT:?set CKPT}" \
  --dataset_dir "${DATASET_DIR:-./dataset}" \
  --sam_masks_dir "${SAM_MASKS_DIR:-./sam_masks}" \
  --visualize --exp_name validate_visualize "$@"
