"""llmseg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) reasoning-segmentation framework.

Re-implements the full capability surface of LLM-Seg (wangjunchi/LLMSeg,
CVPR-W 2024): SAM ViT-H everything-mode proposal generation, a LLaVA-style
vision-language model emitting a ``[SEG]`` intent embedding, DINOv2 dense
features with mask pooling, and a trainable two-way cross-attention mask
selection head — re-designed TPU-first rather than ported.

Layer map (mirrors reference SURVEY.md §1):
  ops/        — Pallas kernels + jnp primitives (flash attention, NMS, RLE, ...)
  models/     — functional model definitions (SAM, CLIP, DINOv2, LLaMA, LLaVA,
                selection head, top-level LLMSeg composition)
  parallel/   — device mesh, sharding rules, collectives
  data/       — host-side data pipeline (datasets, collation, tokenizer, RLE reader)
  train/      — optimizer, train step, trainer loop, eval strategies
  import_weights/ — converters from the reference's torch checkpoint formats
  utils/      — metrics, meters, logging
  native/     — C++ host-side codecs (RLE, connected components)
"""

__version__ = "0.1.0"
