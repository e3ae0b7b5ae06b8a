#!/usr/bin/env bash
# Zero-shot: train without the reason_seg branch (reference train_zero_shot.sh).
set -euo pipefail
python -m cli.train \
  --version "${LLAVA_DIR:?set LLAVA_DIR}" \
  --dinov2_ckpt "${DINOV2_CKPT:?set DINOV2_CKPT}" \
  --dataset_dir "${DATASET_DIR:-./dataset}" \
  --sam_masks_dir "${SAM_MASKS_DIR:-./sam_masks}" \
  --dataset 'sem_seg||refer_seg' --sample_rates '9,3' \
  --epochs 10 --exp_name train_zero_shot "$@"
