#!/usr/bin/env bash
# Eval on LLM-Seg40K validation (reference scripts/validate_llmseg40k.sh).
set -euo pipefail
python -m cli.validate \
  --version "${LLAVA_DIR:?set LLAVA_DIR}" \
  --dinov2_ckpt "${DINOV2_CKPT:?set DINOV2_CKPT}" \
  --resume_ckpt "${CKPT:?set CKPT}" \
  --dataset_dir "${DATASET_DIR:-./dataset}" \
  --sam_masks_dir "${SAM_MASKS_DIR:-./sam_masks}" \
  --val_dataset 'LLMSeg|val' --exp_name validate_llmseg40k "$@"
