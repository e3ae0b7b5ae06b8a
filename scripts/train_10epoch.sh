#!/usr/bin/env bash
# Stage-1 training, 10 epochs (reference scripts/train_10epoch.sh equivalent).
set -euo pipefail
python -m cli.train \
  --version "${LLAVA_DIR:?set LLAVA_DIR to the HF LLaVA-7B directory}" \
  --dinov2_ckpt "${DINOV2_CKPT:?set DINOV2_CKPT}" \
  --dataset_dir "${DATASET_DIR:-./dataset}" \
  --sam_masks_dir "${SAM_MASKS_DIR:-./sam_masks}" \
  --epochs 10 --steps_per_epoch 500 --grad_accumulation_steps 10 \
  --lr 1e-4 --precision bf16 --exp_name train_10epoch "$@"
