"""Activation-parity harness for imported reference checkpoints.

With the real weights on disk (SAM .pth / HF LLaVA dir / DINOv2 .pth /
DeepSpeed llmseg checkpoint), this compares our JAX modules against the
torch/HF reference implementations (from `transformers`, CPU) on shared
random inputs, reporting per-module max abs diff.  Complements the
config-built-model parity tests in tests/test_import.py.

Usage:
  python -m cli.parity --llava_dir <dir> [--clip_dir <dir>]
                       [--dinov2_ckpt <pth>] [--seq 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_llama(llava_dir: str, seq: int) -> float:
    import numpy as np
    import torch
    from transformers import AutoConfig, LlamaForCausalLM

    import jax.numpy as jnp
    from llmseg_tpu import config as C
    from llmseg_tpu.import_weights import torch_import as TI
    from llmseg_tpu.models import llama

    hf_cfg = AutoConfig.from_pretrained(llava_dir)
    hf = LlamaForCausalLM.from_pretrained(
        llava_dir, torch_dtype=torch.float32, attn_implementation="eager")
    hf.eval()
    cfg = C.LlamaConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=getattr(hf_cfg, "num_key_value_heads",
                             hf_cfg.num_attention_heads),
        head_dim=hf_cfg.hidden_size // hf_cfg.num_attention_heads,
        max_seq_len=max(seq, 64))
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = TI.import_llama(sd, cfg, prefix="model.")
    ids = torch.randint(0, min(cfg.vocab_size, 32000), (1, seq))
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    h = llama.apply(params, cfg, input_ids=jnp.asarray(ids.numpy()))
    got = np.asarray(llama.logits(params, cfg, h))
    d = float(np.abs(got - ref).max())
    print(f"llama logits max|diff| = {d:.2e}")
    return d


def check_clip(clip_dir: str) -> float:
    import numpy as np
    import torch
    from transformers import CLIPVisionModel

    import jax.numpy as jnp
    from llmseg_tpu import config as C
    from llmseg_tpu.import_weights import torch_import as TI
    from llmseg_tpu.models import vit

    hf = CLIPVisionModel.from_pretrained(clip_dir,
                                         attn_implementation="eager").eval()
    c = hf.config
    cfg = C.ViTConfig(img_size=c.image_size, patch_size=c.patch_size,
                      hidden_size=c.hidden_size,
                      depth=c.num_hidden_layers,
                      num_heads=c.num_attention_heads,
                      mlp_ratio=c.intermediate_size / c.hidden_size)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = TI.import_clip_vision(sd, cfg, prefix="vision_model.")
    x = torch.randn(1, 3, c.image_size, c.image_size)
    with torch.no_grad():
        ref = hf(x, output_hidden_states=True).hidden_states[-2].numpy()[:, 1:]
    got = np.asarray(vit.clip_features(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg))
    d = float(np.abs(got - ref).max())
    print(f"clip select(-2) features max|diff| = {d:.2e}")
    return d


def main(argv=None):
    p = argparse.ArgumentParser("parity")
    p.add_argument("--llava_dir", default="")
    p.add_argument("--clip_dir", default="")
    p.add_argument("--seq", type=int, default=64)
    args = p.parse_args(argv)
    worst = 0.0
    if args.llava_dir:
        worst = max(worst, check_llama(args.llava_dir, args.seq))
    if args.clip_dir:
        worst = max(worst, check_clip(args.clip_dir))
    if worst > 1e-2:
        print(f"FAIL: worst diff {worst:.2e} > 1e-2")
        sys.exit(1)
    print("parity OK")


if __name__ == "__main__":
    main()
