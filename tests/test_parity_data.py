"""Parity vs importable reference code for the remaining host-side surfaces:
losses (model/loss.py), ResizeLongestSide (segment_anything/utils/
transforms.py, via real PIL), conversation templates (byte-exact get_prompt),
prompt template tables, and get_mask_from_json GT rasterization."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
import reference_stubs  # noqa: E402

reference_stubs.install()


# ---------------------------------------------------------------------------
# Losses (model/loss.py) — the e2e test covers softmax_align/iou_regression;
# here the remaining three: dice, sigmoid CE, sigmoid (SigLIP-style) align
# ---------------------------------------------------------------------------


def test_dice_and_bce_losses_match_reference():
    from model.loss import dice_loss, sigmoid_ce_loss

    from llmseg_tpu import losses as LS

    rng = np.random.RandomState(0)
    logits = rng.randn(3, 16, 16).astype(np.float32) * 2
    targets = (rng.rand(3, 16, 16) < 0.4).astype(np.float32)
    n = 3.0
    ref_d = float(dice_loss(torch.from_numpy(logits),
                            torch.from_numpy(targets), n))
    ref_b = float(sigmoid_ce_loss(torch.from_numpy(logits),
                                  torch.from_numpy(targets), n))
    got_d = float(LS.dice_loss(jnp.asarray(logits.reshape(3, -1)),
                               jnp.asarray(targets.reshape(3, -1)), n))
    got_b = float(LS.sigmoid_ce_loss(jnp.asarray(logits.reshape(3, -1)),
                                     jnp.asarray(targets.reshape(3, -1)), n))
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5)
    np.testing.assert_allclose(got_b, ref_b, rtol=1e-5)


def test_sigmoid_align_loss_matches_reference():
    from model.loss import sigmoid_align_loss

    from llmseg_tpu import losses as LS

    rng = np.random.RandomState(1)
    K, D = 6, 8
    props = rng.randn(K, D).astype(np.float32)
    target = rng.randn(1, D).astype(np.float32)
    gt_iou = rng.rand(K, 1).astype(np.float32)
    t = torch.tensor(10.0)
    b = torch.tensor(-10.0)
    ref = float(sigmoid_align_loss(torch.from_numpy(props),
                                   torch.from_numpy(target),
                                   torch.from_numpy(gt_iou), t, b))
    got = float(LS.sigmoid_align_loss(jnp.asarray(props),
                                      jnp.asarray(target.reshape(-1)),
                                      jnp.asarray(gt_iou.reshape(-1)),
                                      temperature=10.0, bias=-10.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


# ---------------------------------------------------------------------------
# ResizeLongestSide (via real PIL under the torchvision stub)
# ---------------------------------------------------------------------------


def test_resize_longest_side_matches_reference():
    from model.segment_anything.utils.transforms import ResizeLongestSide

    from llmseg_tpu.data import image_ops as io_ops

    rng = np.random.RandomState(2)
    img = (rng.rand(37, 61, 3) * 255).astype(np.uint8)
    ref_t = ResizeLongestSide(64)
    ref_img = ref_t.apply_image(img)
    got_img = io_ops.resize_longest_side(img, 64)
    np.testing.assert_array_equal(got_img, ref_img)

    coords = rng.rand(5, 2) * [61, 37]
    np.testing.assert_allclose(
        io_ops.apply_coords(coords, (37, 61), 64),
        ref_t.apply_coords(coords.copy(), (37, 61)), rtol=1e-6)
    assert (io_ops.get_preprocess_shape(37, 61, 64)
            == ref_t.get_preprocess_shape(37, 61, 64))


# ---------------------------------------------------------------------------
# Conversation templates + prompt tables (wire formats)
# ---------------------------------------------------------------------------


def test_llava_v1_get_prompt_byte_exact():
    from model.llava import conversation as ref_conv

    from llmseg_tpu.data import conversation as our_conv

    r = ref_conv.conv_templates["llava_v1"].copy()
    o = our_conv.conv_templates["llava_v1"].copy()
    assert o.get_prompt() == r.get_prompt()            # system-only
    for q, a in [("<image>\nWhat can we wear on feet?",
                  "The shoes. [SEG]."),
                 ("Why?", "They fit. [SEG].")]:
        r.append_message(r.roles[0], q)
        r.append_message(r.roles[1], a)
        o.append_message(o.roles[0], q)
        o.append_message(o.roles[1], a)
        assert o.get_prompt() == r.get_prompt()
    # unanswered round (generation prompt): assistant slot None
    r.append_message(r.roles[0], "And?")
    r.append_message(r.roles[1], None)
    o.append_message(o.roles[0], "And?")
    o.append_message(o.roles[1], None)
    assert o.get_prompt() == r.get_prompt()


def test_prompt_tables_byte_exact():
    from utils import utils as ref_utils

    from llmseg_tpu.data import prompts as P

    assert P.SHORT_QUESTION_LIST == ref_utils.SHORT_QUESTION_LIST
    assert P.LONG_QUESTION_LIST == ref_utils.LONG_QUESTION_LIST
    assert P.EXPLANATORY_QUESTION_LIST == ref_utils.EXPLANATORY_QUESTION_LIST
    assert P.ANSWER_LIST == ref_utils.ANSWER_LIST
    assert P.DEFAULT_IMAGE_TOKEN == ref_utils.DEFAULT_IMAGE_TOKEN
    assert P.DEFAULT_IM_START_TOKEN == ref_utils.DEFAULT_IM_START_TOKEN
    assert P.DEFAULT_IM_END_TOKEN == ref_utils.DEFAULT_IM_END_TOKEN


# ---------------------------------------------------------------------------
# get_mask_from_json (LabelMe polygon GT)
# ---------------------------------------------------------------------------


def test_get_mask_from_json_matches_reference(tmp_path):
    from utils.data_processing import get_mask_from_json as ref_fn

    from llmseg_tpu.data.data_processing import get_mask_from_json as our_fn

    anno = {
        "text": ["the big thing", "another phrase"],
        "is_sentence": False,
        "shapes": [
            {"label": "target", "points":
             [[5.2, 4.1], [50.7, 6.3], [45.0, 40.2], [8.8, 35.5]]},
            {"label": "ignore", "points":
             [[20.0, 20.0], [30.0, 20.0], [30.0, 30.0], [20.0, 30.0]]},
            {"label": "target", "points":
             [[55.0, 45.0], [62.0, 47.0], [58.0, 58.0]]},
        ],
    }
    path = tmp_path / "img.json"
    path.write_text(json.dumps(anno))
    img = np.zeros((64, 70, 3), np.uint8)
    ref_mask, ref_sents, ref_is_sent = ref_fn(str(path), img)
    got_mask, got_sents, got_is_sent = our_fn(str(path), img)
    np.testing.assert_array_equal(got_mask, ref_mask)
    assert list(got_sents) == list(ref_sents)
    assert got_is_sent == ref_is_sent
