#!/usr/bin/env bash
# Offline AMG extraction for ReasonSeg train+val (reference prepare_ReasonSeg.py).
set -euo pipefail
for split in train val; do
  python -m cli.prepare \
    --image_dir "${DATASET_DIR:-./dataset}/reason_seg/ReasonSeg/${split}" \
    --output "${SAM_MASKS_DIR:-./sam_masks}/ReasonSeg_${split}_masks.json" \
    --sam_ckpt "${SAM_CKPT:?set SAM_CKPT}" "$@"
done
