"""LLaVA SFT stack (M24): preprocessing parity with the reference's
model/llava/train/train.py semantics, dataset/collate shapes, and the
two training regimes (projector pretrain / LoRA SFT)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmseg_tpu import config as C
from llmseg_tpu.data import conversation as conv_lib
from llmseg_tpu.data import llava_sft as S
from llmseg_tpu.data.prompts import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                     IMAGE_TOKEN_INDEX)
from llmseg_tpu.data.tokenizer import ByteTokenizer, tokenizer_image_token
from llmseg_tpu.models import llama, llava
from llmseg_tpu.train import optim, sft


def _tok():
    return ByteTokenizer(model_max_length=96)


# ---------------------------------------------------------------------------
# preprocess_multimodal (reference train.py:314-343)
# ---------------------------------------------------------------------------


def test_preprocess_multimodal_moves_image_to_front():
    src = [[{"from": "human", "value": f"what is this {DEFAULT_IMAGE_TOKEN}?"},
            {"from": "gpt", "value": "a cat"}]]
    (out,) = S.preprocess_multimodal(src)
    assert out[0]["value"] == f"{DEFAULT_IMAGE_TOKEN}\nwhat is this ?"
    assert out[1]["value"] == "a cat"
    # original untouched (reference deepcopies)
    assert DEFAULT_IMAGE_TOKEN in src[0][0]["value"]


def test_preprocess_multimodal_im_start_end():
    src = [[{"from": "human", "value": f"{DEFAULT_IMAGE_TOKEN}\nhi"},
            {"from": "gpt", "value": "yo"}]]
    (out,) = S.preprocess_multimodal(src, mm_use_im_start_end=True)
    assert out[0]["value"].startswith("<im_start>" + DEFAULT_IMAGE_TOKEN
                                      + "<im_end>")


# ---------------------------------------------------------------------------
# preprocess_plain (reference train.py:592-620): tokens before the caption
# are IGNORE, the caption + sep supervise
# ---------------------------------------------------------------------------


def test_preprocess_plain_masking():
    tok = _tok()
    src = [[{"from": "human", "value": f"{DEFAULT_IMAGE_TOKEN}\nignored"},
            {"from": "gpt", "value": "a photo of a dog"}]]
    # reference preprocess_plain overwrites turn 0 with bare <image>
    ((ids, labels),) = S.preprocess_plain(
        [[{"from": "human", "value": DEFAULT_IMAGE_TOKEN},
          src[0][1]]], tok)
    prompt = DEFAULT_IMAGE_TOKEN + "a photo of a dog" + "\n"
    assert ids == tokenizer_image_token(prompt, tok)
    prefix = len(tokenizer_image_token(DEFAULT_IMAGE_TOKEN, tok))
    assert (labels[:prefix] == IGNORE_INDEX).all()
    # caption tokens supervised verbatim
    np.testing.assert_array_equal(labels[prefix:], np.asarray(ids[prefix:]))


# ---------------------------------------------------------------------------
# preprocess_v1 (reference train.py:430-515): questions masked, answers kept
# ---------------------------------------------------------------------------


def test_preprocess_v1_answer_tokens_supervised():
    tok = _tok()
    src = [[{"from": "human", "value": f"{DEFAULT_IMAGE_TOKEN}\nwhat?"},
            {"from": "gpt", "value": "ANSWER_ONE"},
            {"from": "human", "value": "more?"},
            {"from": "gpt", "value": "ANSWER_TWO"}]]
    ((ids, labels),) = S.preprocess_v1(src, tok, conv_type="vicuna_v1")
    sup = [i for i, l in zip(ids, labels) if l != IGNORE_INDEX]
    text = tok.decode(sup)
    assert "ANSWER_ONE" in text and "ANSWER_TWO" in text
    assert "what?" not in text and "more?" not in text
    # system prompt masked
    assert "curious user" not in text


def test_preprocess_v1_drops_leading_gpt_turn():
    tok = _tok()
    src = [[{"from": "gpt", "value": "stray"},
            {"from": "human", "value": "q"},
            {"from": "gpt", "value": "a"}]]
    ((ids, labels),) = S.preprocess_v1(src, tok)
    assert "stray" not in tok.decode(ids)


def test_preprocess_dispatch_plain_vs_v1():
    tok = _tok()
    src = [[{"from": "human", "value": DEFAULT_IMAGE_TOKEN},
            {"from": "gpt", "value": "cap"}]]
    plain = S.preprocess(src, tok, conv_type="plain")
    v1 = S.preprocess([[{"from": "human", "value": "q"},
                        {"from": "gpt", "value": "a"}]], tok,
                      conv_type="vicuna_v1")
    assert plain[0][0] != v1[0][0]


# ---------------------------------------------------------------------------
# expand2square (reference train.py:712-728)
# ---------------------------------------------------------------------------


def test_expand2square():
    img = np.full((4, 10, 3), 7, np.uint8)
    out = S.expand2square(img, (1, 2, 3))
    assert out.shape == (10, 10, 3)
    np.testing.assert_array_equal(out[3:7, :], 7)
    np.testing.assert_array_equal(out[0, 0], [1, 2, 3])
    tall = S.expand2square(np.full((10, 4, 3), 7, np.uint8), (0, 0, 0))
    assert tall.shape == (10, 10, 3)
    np.testing.assert_array_equal(tall[:, 3:7], 7)
    sq = np.zeros((5, 5, 3), np.uint8)
    assert S.expand2square(sq, (9, 9, 9)) is sq


# ---------------------------------------------------------------------------
# SFTDataset + sft_collate
# ---------------------------------------------------------------------------


def _write_corpus(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (30, 44, 3), np.uint8)).save(img_dir / "a.jpg")
    data = [
        {"id": "0", "image": "a.jpg",
         "conversations": [
             {"from": "human", "value": f"{DEFAULT_IMAGE_TOKEN}\nwhat?"},
             {"from": "gpt", "value": "a thing"}]},
        {"id": "1",
         "conversations": [
             {"from": "human", "value": "text only?"},
             {"from": "gpt", "value": "yes"}]},
    ]
    jpath = tmp_path / "sft.json"
    jpath.write_text(json.dumps(data))
    return str(jpath), str(img_dir)


def test_sft_dataset_and_collate(tmp_path):
    tok = _tok()
    jpath, img_dir = _write_corpus(tmp_path)
    ds = S.SFTDataset(jpath, tok, image_folder=img_dir,
                      conv_type="vicuna_v1", clip_size=16)
    assert len(ds) == 2
    s0, s1 = ds[0], ds[1]
    assert s0["has_image"] and not s1["has_image"]
    assert s0["image"].shape == (16, 16, 3)
    # text-only sample gets the zero image (reference train.py:756-760)
    assert np.all(s1["image"] == 0)

    N = 4
    # byte tokenization makes the vicuna system prompt ~150 tokens; keep
    # the placeholder inside T
    batch = S.sft_collate([s0, s1], tok, num_image_tokens=N,
                          model_max_length=320)
    T = 320 - (N - 1)
    assert batch["input_ids"].shape == (2, T)
    assert batch["labels"].shape == (2, T)
    assert batch["images_clip"].shape == (2, 16, 16, 3)
    assert batch["has_image"].tolist() == [True, False]
    # placeholder consumed
    assert (batch["input_ids"] != IMAGE_TOKEN_INDEX).all()
    # image row: splice position is exactly where the placeholder sat
    expect = s0["input_ids"].index(IMAGE_TOKEN_INDEX)
    assert batch["image_pos"][0] == expect
    # text row: splice parked in the padded tail, past every real token
    n_real = len(s1["input_ids"])
    assert batch["image_pos"][1] >= n_real


# ---------------------------------------------------------------------------
# trainable regimes + train step (reference train.py:963-971 / 897-915)
# ---------------------------------------------------------------------------


def _tiny_setup(lora_enable=False):
    cfg = C.llava_tiny()
    params = llava.init(jax.random.PRNGKey(0), cfg)
    lora_cfg = None
    if lora_enable:
        lora_cfg = C.LoraConfig(rank=2)
        params["lora"] = llama.lora_init(jax.random.PRNGKey(1), cfg.llm,
                                         lora_cfg)
    return cfg, params, lora_cfg


def test_projector_only_mask():
    cfg, params, _ = _tiny_setup()
    mask = sft.sft_trainable_mask(params, tune_mm_mlp_adapter=True)
    trainable, skeleton = optim.partition(params, mask)
    assert all(k.startswith("mm_projector") for k in trainable)
    assert len(trainable) >= 1


def test_lora_mask_covers_lora_and_projector():
    cfg, params, _ = _tiny_setup(lora_enable=True)
    mask = sft.sft_trainable_mask(params, lora_enable=True)
    trainable, _ = optim.partition(params, mask)
    keys = set(trainable)
    assert any(k.startswith("lora/") for k in keys)
    assert any(k.startswith("mm_projector") for k in keys)
    assert not any(k.startswith("vision_tower") for k in keys)
    assert not any(k.startswith("llm/") for k in keys)


def _make_batch(tok, cfg, tmp_path):
    jpath, img_dir = _write_corpus(tmp_path)
    ds = S.SFTDataset(jpath, tok, image_folder=img_dir,
                      clip_size=cfg.vision.img_size)
    return S.sft_collate([ds[0], ds[1]], tok,
                         num_image_tokens=cfg.num_image_tokens,
                         model_max_length=320)


def test_sft_train_step_decreases_loss(tmp_path):
    tok = _tok()
    cfg, params, lora_cfg = _tiny_setup(lora_enable=True)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm,
                                     vocab_size=max(cfg.llm.vocab_size,
                                                    tok.vocab_size)))
    params = llava.init(jax.random.PRNGKey(0), cfg)
    params["lora"] = llama.lora_init(jax.random.PRNGKey(1), cfg.llm, lora_cfg)

    mask = sft.sft_trainable_mask(params, lora_enable=True)
    trainable, skeleton = optim.partition(params, mask)
    tcfg = C.TrainConfig(lr=1e-2, epochs=1, steps_per_epoch=8,
                         warmup_steps=1, grad_accum_steps=1)
    tx = optim.make_trainable_optimizer(tcfg)
    opt_state = tx.init(trainable)
    step_fn = jax.jit(sft.make_sft_train_step(cfg, tx, lora_cfg=lora_cfg,
                                              remat=False))

    batch = _make_batch(tok, cfg, tmp_path)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(5):
        trainable, opt_state, m = step_fn(trainable, skeleton, opt_state,
                                          batch)
        losses.append(float(m["ce_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sft_text_only_rows_isolated_from_image(tmp_path):
    """A text-only row's loss must not depend on the image content: the
    zeroed splice lands in the padded tail behind a causal mask."""
    tok = _tok()
    cfg, params, _ = _tiny_setup()
    batch = _make_batch(tok, cfg, tmp_path)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    l0 = sft.sft_loss(params, cfg, batch)

    # perturb the image pixels; only row 0 (has_image) may change, and the
    # whole-batch loss must stay finite & change only through row 0
    b2 = dict(batch)
    b2["images_clip"] = batch["images_clip"] + 1.0
    l1 = sft.sft_loss(params, cfg, b2)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))

    # now make BOTH rows text-only: loss becomes image-invariant
    b3 = dict(batch)
    b3["has_image"] = jnp.zeros_like(batch["has_image"])
    b3["image_pos"] = jnp.full_like(batch["image_pos"],
                                    batch["input_ids"].shape[1] - 1)
    l3a = sft.sft_loss(params, cfg, b3)
    b4 = dict(b3)
    b4["images_clip"] = b3["images_clip"] + 1.0
    l3b = sft.sft_loss(params, cfg, b4)
    np.testing.assert_allclose(float(l3a), float(l3b), rtol=1e-6)


def test_cli_sft_smoke(tmp_path):
    """End-to-end: cli.sft on the synthetic corpus, 2 steps, tiny model."""
    from cli import sft as cli_sft

    jpath, img_dir = _write_corpus(tmp_path)
    out = str(tmp_path / "out")
    cli_sft.main([
        "--data_path", jpath, "--image_folder", img_dir,
        "--model_size", "tiny", "--lora_enable", "--precision", "fp32",
        "--model_max_length", "320", "--batch_size", "1", "--epochs", "1",
        "--max_steps", "2", "--print_freq", "1", "--output_dir", out,
    ])
    assert os.path.isdir(out)
