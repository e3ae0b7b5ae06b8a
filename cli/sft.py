"""LLaVA supervised finetuning / projector pretraining (reference M24,
model/llava/train/train.py ``train()`` — the vendored LLaVA stack).

Two regimes, mirroring the reference's HF-Trainer run:
  * ``--tune_mm_mlp_adapter`` — feature-alignment pretrain: only the
    mm_projector trains, conversation template "plain"
    (reference train.py:963-971 + preprocess_plain);
  * ``--lora_enable`` — instruction SFT: LoRA on the LLM q/v projections
    + the projector (reference train.py:897-915), template "vicuna_v1".

Usage:
  python -m cli.sft --data_path blip_laion_558k.json --image_folder imgs \
      --version <hf llava dir> --tune_mm_mlp_adapter --conv_type plain
  python -m cli.sft --data_path llava_instruct_150k.json --image_folder \
      coco/train2017 --version <hf llava dir> --lora_enable
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("llava_sft")
    p.add_argument("--data_path", required=True,
                   help="json list of {id, image?, conversations}")
    p.add_argument("--image_folder", default="")
    p.add_argument("--version", default="",
                   help="HF LLaVA dir (weights + tokenizer); empty = "
                        "random init + byte tokenizer (tests)")
    p.add_argument("--model_size", default="7b",
                   choices=["7b", "small", "tiny"])
    p.add_argument("--conv_type", default="vicuna_v1",
                   choices=["vicuna_v1", "llava_v1", "plain"])
    p.add_argument("--tune_mm_mlp_adapter", action="store_true")
    p.add_argument("--lora_enable", action="store_true")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--mm_use_im_start_end", action="store_true")
    p.add_argument("--image_aspect_ratio", default="pad",
                   choices=["pad", "none"])
    p.add_argument("--model_max_length", type=int, default=512)
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N optimizer steps (0 = full epochs)")
    p.add_argument("--output_dir", default="./runs/llava_sft")
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llmseg_tpu import config as C
    from llmseg_tpu.data import llava_sft as S
    from llmseg_tpu.data.tokenizer import ByteTokenizer, HFTokenizer
    from llmseg_tpu.models import llama, llava
    from llmseg_tpu.train import checkpoint, optim, sft

    args = build_parser().parse_args(argv)

    if args.version:
        tokenizer = HFTokenizer(args.version,
                                model_max_length=args.model_max_length,
                                use_mm_start_end=args.mm_use_im_start_end)
    else:
        tokenizer = ByteTokenizer(model_max_length=args.model_max_length)

    if args.model_size == "7b":
        cfg = C.LlavaConfig()
    elif args.model_size == "small":
        cfg = C.llmseg_small().llava
    else:
        cfg = C.llava_tiny()
    if tokenizer.vocab_size > cfg.llm.vocab_size:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm,
                                         vocab_size=tokenizer.vocab_size))

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    key = jax.random.PRNGKey(args.seed)
    if args.version:
        from llmseg_tpu.import_weights import torch_import
        params = torch_import.import_llava_dir(args.version, cfg)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    else:
        params = llava.init(key, cfg, dtype)

    lora_cfg = None
    if args.lora_enable:
        lora_cfg = C.LoraConfig(rank=args.lora_r, alpha=args.lora_alpha)
        params["lora"] = llama.lora_init(jax.random.fold_in(key, 1),
                                         cfg.llm, lora_cfg, dtype)

    mask = sft.sft_trainable_mask(
        params, tune_mm_mlp_adapter=args.tune_mm_mlp_adapter,
        lora_enable=args.lora_enable)
    trainable, skeleton = optim.partition(params, mask)
    n_train = sum(int(np.prod(v.shape)) for v in trainable.values())
    print(f"trainable params: {n_train / 1e6:.2f}M "
          f"({len(trainable)} tensors)")

    dataset = S.SFTDataset(args.data_path, tokenizer,
                           image_folder=args.image_folder,
                           conv_type=args.conv_type,
                           image_aspect_ratio=args.image_aspect_ratio,
                           clip_size=cfg.vision.img_size,
                           mm_use_im_start_end=args.mm_use_im_start_end)
    tcfg = C.TrainConfig(lr=args.lr, epochs=args.epochs,
                         steps_per_epoch=max(1, len(dataset)
                                             // args.batch_size),
                         warmup_steps=args.warmup_steps,
                         grad_clip=args.grad_clip,
                         grad_accum_steps=args.grad_accumulation_steps)

    tx = optim.make_trainable_optimizer(tcfg)
    opt_state = tx.init(trainable)
    step_fn = jax.jit(sft.make_sft_train_step(cfg, tx, lora_cfg=lora_cfg),
                      donate_argnums=(0, 2))

    rng = np.random.default_rng(args.seed)
    step = 0
    for epoch in range(args.epochs):
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            insts = [dataset[int(j)] for j in order[i:i + args.batch_size]]
            batch = S.sft_collate(insts, tokenizer,
                                  num_image_tokens=cfg.num_image_tokens,
                                  model_max_length=args.model_max_length)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            t0 = time.time()
            trainable, opt_state, metrics = step_fn(trainable, skeleton,
                                                    opt_state, batch)
            step += 1
            if step % args.print_freq == 0 or step == 1:
                ce = float(metrics["ce_loss"])
                print(f"epoch {epoch} step {step}: ce={ce:.4f} "
                      f"gnorm={float(metrics['grad_norm']):.3f} "
                      f"({time.time() - t0:.2f}s)")
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break

    os.makedirs(args.output_dir, exist_ok=True)
    final = optim.combine(skeleton, trainable)
    checkpoint.save(args.output_dir, step, final)
    print(f"saved step {step} to {args.output_dir}")


if __name__ == "__main__":
    main()
