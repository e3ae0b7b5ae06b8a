"""Shared test helper: build a tiny LLaMA-like HF fast tokenizer (Metaspace
pre-tokenizer + BOS post-processor — sentencepiece-like boundary merges)
and optionally a matching tiny HF LLaVA-style checkpoint directory."""

from __future__ import annotations


def build_tiny_fast_tokenizer(out_dir: str, corpus: list,
                              vocab_size: int = 600) -> str:
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            processors, trainers)
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁",
                                                 prepend_scheme="first")
    tok.decoder = decoders.Metaspace(replacement="▁",
                                     prepend_scheme="first")
    alphabet = sorted(set("".join(corpus))) + ["▁"]
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=alphabet)
    tok.train_from_iterator(corpus, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", tok.token_to_id("<s>"))])
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, bos_token="<s>",
                                   eos_token="</s>", unk_token="<unk>")
    fast.save_pretrained(out_dir)
    return out_dir


def add_tiny_llava_weights(out_dir: str, *, vocab_size: int,
                           hidden_size: int = 64, intermediate_size: int = 128,
                           num_layers: int = 2, num_heads: int = 4,
                           mm_hidden_size: int = 32, seed: int = 0) -> None:
    """Save a tiny HF LlamaForCausalLM + mm_projector into out_dir, making
    it look like a (pre-merged) LLaVA checkpoint directory."""
    import numpy as np
    import safetensors.numpy as st
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=vocab_size, hidden_size=hidden_size,
                      intermediate_size=intermediate_size,
                      num_hidden_layers=num_layers,
                      num_attention_heads=num_heads,
                      num_key_value_heads=num_heads,
                      max_position_embeddings=512, rms_norm_eps=1e-6)
    torch.manual_seed(seed)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(out_dir, safe_serialization=True)
    import os

    path = os.path.join(out_dir, "model.safetensors")
    sd = dict(st.load_file(path))
    rng = np.random.RandomState(seed)
    sd["model.mm_projector.weight"] = (
        rng.randn(hidden_size, mm_hidden_size).astype(np.float32) * 0.02)
    sd["model.mm_projector.bias"] = np.zeros(hidden_size, np.float32)
    st.save_file(sd, path)
