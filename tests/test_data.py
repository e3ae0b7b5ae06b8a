import json

import numpy as np
import pytest

from llmseg_tpu.data import collate as collate_lib
from llmseg_tpu.data import conversation as conv_lib
from llmseg_tpu.data import data_processing, mask_reader
from llmseg_tpu.data.prompts import (ANSWER_LIST, IGNORE_INDEX,
                                     IMAGE_TOKEN_INDEX, SHORT_QUESTION_LIST)
from llmseg_tpu.data.tokenizer import (ByteTokenizer, seg_token_id,
                                       tokenizer_image_token)
from llmseg_tpu.ops import rle as rle_lib
from llmseg_tpu.utils import metrics


def _make_conversation(question="Can you segment the cat in this image?",
                       answer="Sure, it is [SEG]."):
    conv = conv_lib.get_default_conv_template("llava_v1")
    conv.append_message(conv.roles[0], "<image>\n" + question)
    conv.append_message(conv.roles[1], answer)
    return conv.get_prompt()


def test_conversation_prompt():
    p = _make_conversation()
    assert p.startswith("A chat between a curious human")
    assert " USER: <image>\n" in p
    assert " ASSISTANT: Sure, it is [SEG].</s>" in p


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "hello [SEG] world</s>"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids[1:]) == text
    assert seg_token_id(tok) == tok.convert_tokens_to_ids("[SEG]")


def test_tokenizer_image_token():
    tok = ByteTokenizer()
    ids = tokenizer_image_token("ab<image>cd", tok)
    assert ids[0] == tok.bos_token_id
    i = ids.index(IMAGE_TOKEN_INDEX)
    assert tok.decode(ids[1:i]) == "ab"
    assert tok.decode(ids[i + 1:]) == "cd"
    assert ids.count(IMAGE_TOKEN_INDEX) == 1


def _sample(rng, k=5, g=16, n_conv=2):
    conversations = [_make_conversation(q) for q in
                     ["Can you segment the cat in this image?",
                      "Please segment the dog in this image."][:n_conv]]
    return {
        "image_path": "x.jpg",
        "images_dino": rng.randn(28, 28, 3).astype(np.float32),
        "images_clip": rng.randn(14, 14, 3).astype(np.float32),
        "conversations": conversations,
        "segs": (rng.rand(k, g, g) < 0.5).astype(np.float32),
        "ious": rng.rand(n_conv, k).astype(np.float32),
        "iops": rng.rand(n_conv, k).astype(np.float32),
        "inference": False,
    }


def test_collate_shapes_and_masking():
    rng = np.random.RandomState(0)
    tok = ByteTokenizer(model_max_length=600)
    samples = [_sample(rng), _sample(rng, n_conv=1)]
    n_img_tok = 9
    batch, extras = collate_lib.collate(
        samples, tok, num_image_tokens=n_img_tok, rows_per_sample=2,
        max_proposals=8)
    T = 600 - (n_img_tok - 1)
    assert batch["input_ids"].shape == (4, T)
    assert batch["labels"].shape == (4, T)
    assert batch["sam_segs"].shape == (2, 8, 16, 16)
    np.testing.assert_array_equal(batch["row_valid"], [1, 1, 1, 0])
    np.testing.assert_array_equal(batch["row_to_image"], [0, 0, 1, 0])
    np.testing.assert_array_equal(batch["prop_valid"][:, :5], True)
    np.testing.assert_array_equal(batch["prop_valid"][:, 5:], False)

    # masking: the answer tokens (+ eos) survive, question tokens masked
    ids, tgt = batch["input_ids"][0], batch["labels"][0]
    valid = tgt != IGNORE_INDEX
    assert valid.sum() > 0
    kept = tok.decode(ids[valid])
    assert "Sure, it is [SEG]." in kept
    assert "segment the cat" not in kept
    # [SEG] id present in input_ids, no placeholder leakage
    assert (ids == seg_token_id(tok)).sum() == 1
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 0
    # image_pos points at the spot where <image> used to be
    assert batch["image_pos"][0] > 0


def test_mask_reader(tmp_path):
    rng = np.random.RandomState(1)
    masks = []
    for i in range(3):
        m = (rng.rand(20, 30) < 0.3).astype(np.uint8)
        masks.append({"segmentation": rle_lib.encode(m),
                      "area": int(m.sum()), "bbox": [0, 0, 30, 20]})
    doc = [{"image": "a.jpg", "target_size": [20, 30], "masks": masks}]
    p = tmp_path / "masks.json"
    p.write_text(json.dumps(doc))

    reader = mask_reader.SamMaskReader(str(p), top_k=2, verbose=False)
    assert "a.jpg" in reader
    out = reader.extract_sam_segs("a.jpg")
    assert out["segs_origin"].shape == (20, 30, 2)
    assert out["segs_square"].shape == (30, 30, 2)
    # sorted by area desc
    areas = out["segs_origin"].sum(axis=(0, 1))
    assert areas[0] >= areas[1]
    small = mask_reader.resize_segs_bilinear(out["segs_square"], 16)
    assert small.shape == (2, 16, 16)
    assert 0 <= small.min() and small.max() <= 1.0 + 1e-6


def test_get_mask_from_json(tmp_path):
    anno = {
        "shapes": [
            {"label": "target", "points": [[2, 2], [10, 2], [10, 10], [2, 10]]},
            {"label": "ignore_region", "points": [[12, 12], [18, 12], [18, 18], [12, 18]]},
            {"label": "flag", "points": [[0, 0], [1, 0], [1, 1]]},
        ],
        "text": ["the square thing"],
        "is_sentence": False,
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(anno))
    img = np.zeros((24, 24, 3), np.uint8)
    mask, sents, is_sentence = data_processing.get_mask_from_json(str(p), img)
    assert mask[5, 5] == 1
    assert mask[15, 15] == 255
    assert mask[0, 20] == 0
    assert sents == ["the square thing"] and not is_sentence


def test_iou_iop_labels():
    rng = np.random.RandomState(2)
    segs = (rng.rand(16, 16, 4) < 0.4).astype(np.uint8)
    gt = (rng.rand(32, 32) < 0.4).astype(np.uint8)   # different res
    iou, iop = metrics.compute_all_iou_iop(segs, gt)
    assert iou.shape == (4,) and iop.shape == (4,)
    gt_r = metrics._nearest_resize(gt, (16, 16))
    for i in range(4):
        np.testing.assert_allclose(iou[i], metrics.compute_iou(segs[..., i], gt_r),
                                   rtol=1e-6)
        np.testing.assert_allclose(iop[i], metrics.compute_iop(segs[..., i], gt_r),
                                   rtol=1e-6)


def test_intersection_and_union():
    out = np.array([0, 1, 1, 0, 255])
    tgt = np.array([0, 1, 0, 255, 1])
    inter, union, target = metrics.intersection_and_union(out, tgt, K=2)
    # pixel 3 ignored (target 255 -> output set to 255 too)
    np.testing.assert_array_equal(inter, [1, 1])
    np.testing.assert_array_equal(union, [2, 3])
    np.testing.assert_array_equal(target, [2, 2])


def test_meters():
    m = metrics.AverageMeter("loss", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    m.all_reduce()  # single-process no-op
    assert m.avg == 2.0
