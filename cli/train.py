"""Stage-1 training entry (capability parity with reference training.py):
sem/refer/reason mixture, per-epoch ReasonSeg-val eval, best-gIoU checkpoint.

Usage:
  python -m cli.train --dataset_dir ... --sam_masks_dir ... \
      --version <hf-llava-dir> --dinov2_ckpt <pth> --exp_name run1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from cli import common
    from llmseg_tpu.train.loader import BatchLoader
    from llmseg_tpu.train.trainer import Trainer

    args = common.build_parser("train").parse_args(argv)
    if args.w8a8 and not args.load_8bit:
        raise SystemExit("--w8a8 is an int8 mode; combine it with "
                         "--load_8bit, not --load_4bit or alone")
    if (args.load_8bit or args.load_4bit) and not args.eval_only:
        raise SystemExit("--load_8bit/--load_4bit are inference-only "
                         "(reference builder.py loads them for eval); "
                         "use --quantize_frozen for QLoRA training")
    common.maybe_init_multihost(args)
    cfg = common.to_config(args)
    lora_cfg = cfg.train.lora

    tokenizer = common.build_tokenizer(args, cfg)
    cfg = common.align_model_to_tokenizer(cfg, tokenizer)
    readers = {}
    train_ds = None if args.eval_only else common.build_train_dataset(
        args, cfg, readers)
    val_ds = None if cfg.train.no_eval else common.build_val_dataset(
        args, cfg, readers)

    params = common.import_initial_params(args, cfg, lora_cfg)

    import jax as _jax

    from llmseg_tpu.utils.logging import MetricLogger

    writer = MetricLogger(cfg.train.log_dir, project="llmseg",
                          exp_name=cfg.train.exp_name,
                          rank=_jax.process_index())
    trainer = Trainer(cfg, lora_cfg=lora_cfg, params=params, writer=writer)
    if args.auto_resume:
        trainer.maybe_resume()
    import jax

    train_collate = common.build_collate(args, cfg, tokenizer,
                                         cfg.data.num_classes_per_sample)
    val_collate = common.build_collate(args, cfg, tokenizer, 1)
    micro_per_epoch = cfg.train.steps_per_epoch * cfg.train.grad_accum_steps
    train_loader = BatchLoader(
        train_ds, train_collate, cfg.train.batch_size, micro_per_epoch,
        shuffle=False, process_index=jax.process_index(),
        process_count=jax.process_count())

    def val_batches():
        import jax.numpy as jnp

        # batched val forward (BASELINE configs[3]: batch 8/chip).  The
        # loader tiles a short final batch back to full size (one static
        # shape -> one XLA program); the tiled filler rows are exactly the
        # trailing ones, marked invalid so metrics cover the dataset once.
        bsz = max(args.val_batch_size, 1)
        n_shard = len(range(len(val_ds))[jax.process_index()::
                                         jax.process_count()])
        steps = -(-n_shard // bsz)
        loader = BatchLoader(val_ds, val_collate, bsz, steps,
                             process_index=jax.process_index(),
                             process_count=jax.process_count())
        for j, (batch, extras) in enumerate(loader.epoch(0)):
            n_valid = min(bsz, max(n_shard - j * bsz, 0))
            extras["row_valid"] = [True] * n_valid + \
                [False] * (bsz - n_valid)
            yield ({k: jnp.asarray(v) for k, v in batch.items()}, extras)

    if args.load_8bit or args.load_4bit:
        # inference-time weight-only quantization AFTER any restore
        # (reference load_8bit/load_4bit, model/llava/model/builder.py:
        # 40-58).  In-place mutation of the frozen skeleton so the bf16
        # and int trees never coexist on a 16 GB chip.  For --w8a8 (and
        # --load_4bit), a calibration forward over the first val batches
        # runs FIRST (bf16 weights must still be live): SmoothQuant
        # outlier folding for W8A8, AWQ-style salient-channel protection
        # for int4 — both at zero runtime cost (static reparameterization,
        # ops/quant.fold_smooth_llama_inplace).
        from llmseg_tpu.ops import quant

        if args.w8a8 and args.load_4bit:
            raise SystemExit("--w8a8 is an int8 mode; combine it with "
                             "--load_8bit, not --load_4bit")
        smooth_stats = None
        if (args.w8a8 or args.load_4bit) and val_ds is not None:
            import itertools

            from llmseg_tpu.models import llmseg

            calib = (b for b, _ in itertools.islice(
                val_batches(), max(args.calib_batches, 0)))
            smooth_stats = llmseg.calibrate_quant_stats(
                trainer.params, cfg.model, calib, lora_cfg=lora_cfg)
        # the live LoRA overlay MUST ride through the fold so it is
        # compensated (a rows *= s_attn, v-b cols /= s_o) — an
        # uncompensated adapter on the folded base is silently wrong
        # (ADVICE r4 high).  trainer.params builds fresh containers, so
        # the compensated leaves are written back into the flat
        # trainable dict afterwards.
        lora_tree = trainer.params.get("lora") if smooth_stats else None
        quant.quantize_llama_inplace(trainer.skeleton["llava"]["llm"],
                                     bits=4 if args.load_4bit else 8,
                                     w8a8=args.w8a8,
                                     smooth_stats=smooth_stats,
                                     lora=lora_tree,
                                     head_dim=cfg.model.llava.llm.head_dim)
        if lora_tree is not None:
            def _writeback(node, path):
                if isinstance(node, dict):
                    for k, v in node.items():
                        _writeback(v, path + (str(k),))
                elif isinstance(node, (list, tuple)):
                    for i, v in enumerate(node):
                        _writeback(v, path + (str(i),))
                else:
                    trainer.trainable["/".join(path)] = node

            _writeback(lora_tree, ("lora",))

    if args.eval_only:
        # exact frozen-tower reparameterization (DINO layerscale fold):
        # inference never pays the two per-block (B, T, D) multiplies
        from llmseg_tpu.models import llmseg as _llmseg

        _llmseg.fold_frozen_inplace(trainer.skeleton)
        vis = os.path.join(cfg.train.log_dir, "eval_vis") \
            if args.visualize else None
        res = trainer.validate(val_batches(), strategy=args.eval_strategy,
                               threshold=args.eval_threshold,
                               visualize_dir=vis)
        print(f"giou: {res['giou']:.4f}, ciou: {res['ciou']:.4f}")
        return res

    start_epoch = trainer.global_step // cfg.train.steps_per_epoch
    for epoch in range(start_epoch, cfg.train.epochs):
        def micro_batches():
            for batch, _ in train_loader.epoch(epoch):
                yield batch

        train_metrics = trainer.train_epoch(micro_batches(), epoch)
        print(f"epoch {epoch}: " + " ".join(
            f"{k}={v:.4f}" for k, v in train_metrics.items()))
        if val_ds is not None:
            res = trainer.validate(val_batches(),
                                   strategy=args.eval_strategy,
                                   threshold=args.eval_threshold)
            print(f"epoch {epoch}: giou={res['giou']:.4f} "
                  f"ciou={res['ciou']:.4f}")
            if trainer.save_best(res):
                print(f"epoch {epoch}: new best {res['giou']:.4f}")


if __name__ == "__main__":
    main()
