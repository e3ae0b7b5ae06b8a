"""Eval-only entry (capability parity with reference training.py --eval_only
and validate_llmseg.py): runs any validation strategy over ReasonSeg-val or
LLMSeg40K-val, optional visualization dumps.

Usage:
  python -m cli.validate --dataset_dir ... --sam_masks_dir ... \
      --resume_ckpt <ckpt> --eval_strategy threshold --visualize
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from cli import common
    from cli.train import main as train_main

    argv = list(argv if argv is not None else sys.argv[1:])
    if "--eval_only" not in argv:
        argv.append("--eval_only")
    return train_main(argv)


if __name__ == "__main__":
    main()
