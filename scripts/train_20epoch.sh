#!/usr/bin/env bash
# Stage-1 training, 20 epochs (the headline 55.4-gIoU configuration).
set -euo pipefail
python -m cli.train \
  --version "${LLAVA_DIR:?set LLAVA_DIR}" \
  --dinov2_ckpt "${DINOV2_CKPT:?set DINOV2_CKPT}" \
  --dataset_dir "${DATASET_DIR:-./dataset}" \
  --sam_masks_dir "${SAM_MASKS_DIR:-./sam_masks}" \
  --epochs 20 --steps_per_epoch 500 --grad_accumulation_steps 10 \
  --lr 1e-4 --precision bf16 --exp_name train_20epoch "$@"
