"""Stage-2 finetune on LLM-Seg40K (capability parity with reference
finetune_llmseg.py): LLMSegDataset, lr 1e-5, 5 epochs, weights-only resume.

Usage:
  python -m cli.finetune --dataset_dir ... --sam_masks_dir ... \
      --resume_ckpt <stage1 ckpt> --lr 1e-5 --epochs 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax

    from cli import common
    from llmseg_tpu.data import datasets as D
    from llmseg_tpu.train.loader import BatchLoader
    from llmseg_tpu.train.trainer import Trainer

    parser = common.build_parser("finetune")
    parser.set_defaults(lr=1e-5, epochs=5,
                        val_dataset="LLMSeg|val")
    args = parser.parse_args(argv)
    common.maybe_init_multihost(args)
    cfg = common.to_config(args)
    lora_cfg = cfg.train.lora

    tokenizer = common.build_tokenizer(args, cfg)
    cfg = common.align_model_to_tokenizer(cfg, tokenizer)
    readers = {}
    paths = common.mask_reader_paths(cfg)

    train_ds = D.LLMSegDataset(
        os.path.join(cfg.data.dataset_dir, "llm_seg", "train.json"),
        os.path.join(cfg.data.dataset_dir, "coco/train2017"),
        os.path.join(cfg.data.dataset_dir, "ego_objects/images"),
        common.load_reader(paths, "llmseg40k_train"),
        common.load_reader(paths, "egoobjects"),
        image_size=cfg.data.image_size,
        clip_size=cfg.data.clip_image_size,
        seg_grid=cfg.model.seg_grid, seed=cfg.train.seed,
        conv_type=args.conv_type)
    val_ds = None if cfg.train.no_eval else common.build_val_dataset(
        args, cfg, readers)

    params = common.import_initial_params(args, cfg, lora_cfg)
    trainer = Trainer(cfg, lora_cfg=lora_cfg, params=params)
    # finetune resumes model weights only (reference finetune_llmseg.py:434)
    trainer.maybe_resume(weights_only=True)

    train_collate = common.build_collate(args, cfg, tokenizer, 1)
    val_collate = common.build_collate(args, cfg, tokenizer, 1)
    micro_per_epoch = cfg.train.steps_per_epoch * cfg.train.grad_accum_steps
    loader = BatchLoader(train_ds, train_collate, cfg.train.batch_size,
                         micro_per_epoch, shuffle=True, seed=cfg.train.seed,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())

    def val_batches():
        vloader = BatchLoader(val_ds, val_collate, 1, len(val_ds))
        for batch, extras in vloader.epoch(0):
            import jax.numpy as jnp

            yield ({k: jnp.asarray(v) for k, v in batch.items()}, extras)

    for epoch in range(cfg.train.epochs):
        def micro_batches():
            for batch, _ in loader.epoch(epoch):
                yield batch

        metrics = trainer.train_epoch(micro_batches(), epoch)
        print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}"
                                            for k, v in metrics.items()))
        if val_ds is not None:
            res = trainer.validate(val_batches(),
                                   strategy=args.eval_strategy,
                                   threshold=args.eval_threshold)
            print(f"epoch {epoch}: giou={res['giou']:.4f} "
                  f"ciou={res['ciou']:.4f}")
            trainer.save_best(res)


if __name__ == "__main__":
    main()
