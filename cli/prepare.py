"""Offline SAM everything-mode mask extraction (capability parity with the
whole reference prepare_datasets/ directory: prepare_ReasonSeg/coco/ade20k/
voc2010/saiapr/mapillary/egoobjects + split_coco + convert_h5_to_json).

One entry handles any image corpus:
  python -m cli.prepare --image_dir <dir> --output masks.json \
      --sam_ckpt sam_vit_h_4b8939.pth [--glob '*.jpg'] [--recursive]
      [--num_shards 8 --shard 3]        # split_coco-style host sharding
      [--hdf5 out.h5]                   # also write the reference h5 format

Per image (reference prepare_ReasonSeg.py:55-116): longest-side<=1024 resize
(cv2 INTER_AREA — bit-compat with the reference's preprocess_images), AMG on
the TPU, COCO-RLE annotations to masks.json with the reference schema
{image, target_size, masks:[...]}.
"""

from __future__ import annotations

import argparse
import glob as glob_lib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llmseg_tpu import config as C  # noqa: E402


def preprocess_image(image, max_side: int = 1024):
    """reference prepare_ReasonSeg.py:32-40: downscale longest side to 1024
    with cv2.INTER_AREA; never upscale."""
    import cv2

    h, w = image.shape[:2]
    if max(h, w) <= max_side:
        return image
    scale = max_side / max(h, w)
    return cv2.resize(image, (int(w * scale), int(h * scale)),
                      interpolation=cv2.INTER_AREA)


def main(argv=None):
    import cv2
    import jax
    import numpy as np

    from llmseg_tpu.import_weights import torch_import as TI
    from llmseg_tpu.models.sam import amg as amg_lib
    from llmseg_tpu.models.sam import sam as sam_lib

    p = argparse.ArgumentParser("prepare")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--sam_ckpt", default="")
    p.add_argument("--sam_model", default="vit_h",
                   choices=list(sam_lib.MODEL_REGISTRY))
    p.add_argument("--glob", default="*.jpg")
    p.add_argument("--recursive", action="store_true")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--max_side", type=int, default=0,
                   help="longest-side resize; 0 = SAM input size")
    p.add_argument("--points_per_side", type=int, default=32)
    p.add_argument("--points_per_batch", type=int, default=64)
    p.add_argument("--pred_iou_thresh", type=float, default=0.88)
    p.add_argument("--stability_score_thresh", type=float, default=0.95)
    p.add_argument("--box_nms_thresh", type=float, default=0.7)
    p.add_argument("--crop_n_layers", type=int, default=0,
                   help="crop cascade layers (reference crop_n_layers; "
                        "every LLM-Seg prepare script uses 0)")
    p.add_argument("--crop_nms_thresh", type=float, default=0.7)
    p.add_argument("--min_mask_region_area", type=int, default=0)
    p.add_argument("--hdf5", default="", help="also write reference h5 format")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    cfg = sam_lib.MODEL_REGISTRY[args.sam_model]()
    if args.sam_ckpt:
        params = TI.import_sam_pth(args.sam_ckpt, cfg)
        import jax.numpy as jnp

        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        print("WARNING: no --sam_ckpt; random weights (smoke-test only)")
        import jax.numpy as jnp

        params = sam_lib.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    max_side = args.max_side or cfg.encoder.img_size
    amg_cfg = C.AMGConfig(points_per_side=args.points_per_side,
                          points_per_batch=args.points_per_batch,
                          pred_iou_thresh=args.pred_iou_thresh,
                          stability_score_thresh=args.stability_score_thresh,
                          box_nms_thresh=args.box_nms_thresh,
                          crop_n_layers=args.crop_n_layers,
                          crop_nms_thresh=args.crop_nms_thresh,
                          min_mask_region_area=args.min_mask_region_area)
    gen = amg_lib.AutomaticMaskGenerator(params, cfg, amg_cfg)

    pattern = os.path.join(args.image_dir,
                           "**" if args.recursive else "", args.glob)
    files = sorted(glob_lib.glob(pattern, recursive=args.recursive))
    # round-robin sharding (reference split_coco.py)
    files = files[args.shard::args.num_shards]
    if args.limit:
        files = files[:args.limit]
    print(f"prepare: {len(files)} images (shard {args.shard}/"
          f"{args.num_shards})")

    results = []
    t0 = time.time()
    # 1-deep pipeline: submit image i+1's device work before finishing
    # image i, so i's host transfers + RLE encode overlap i+1's encoder run
    # (the reference loop is strictly serial, prepare_ReasonSeg.py:72-116)
    pending = None
    n_done = 0

    def _drain(pending):
        nonlocal n_done
        rel, shape, handle = pending
        results.append({
            "image": rel,
            "target_size": [shape[0], shape[1]],
            "masks": gen.finish(handle),
        })
        n_done += 1
        if n_done % 10 == 0:
            dt = (time.time() - t0) / n_done
            print(f"{n_done}/{len(files)} images, {dt:.2f}s/image",
                  flush=True)

    for path in files:
        img = cv2.imread(path)
        if img is None:
            print(f"skip unreadable {path}")
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = preprocess_image(img, max_side)
        if pending is not None:
            # enqueue the previous image's upscale BEFORE this submit, so
            # its packed download + RLE overlap this image's device work
            gen.prefetch(pending[2])
        handle = gen.submit(img)
        if pending is not None:
            _drain(pending)
        pending = (os.path.relpath(path, args.image_dir), img.shape, handle)
    if pending is not None:
        _drain(pending)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.output} ({len(results)} images, "
          f"{time.time() - t0:.0f}s)")

    if args.hdf5:
        import h5py

        with h5py.File(args.hdf5, "w") as h5:
            for r in results:
                # reference h5 format: stringified dict per image
                # (prepare_ReasonSeg.py:104-115)
                h5.create_dataset(r["image"], data=str(r))
        print(f"wrote {args.hdf5}")


if __name__ == "__main__":
    main()
