#!/usr/bin/env bash
# Stage-2 finetune on LLM-Seg40K (reference scripts/finetune_llmseg.sh).
set -euo pipefail
python -m cli.finetune \
  --version "${LLAVA_DIR:?set LLAVA_DIR}" \
  --dinov2_ckpt "${DINOV2_CKPT:?set DINOV2_CKPT}" \
  --resume_ckpt "${STAGE1_CKPT:?set STAGE1_CKPT}" \
  --dataset_dir "${DATASET_DIR:-./dataset}" \
  --sam_masks_dir "${SAM_MASKS_DIR:-./sam_masks}" \
  --lr 1e-5 --epochs 5 --exp_name finetune_llmseg "$@"
