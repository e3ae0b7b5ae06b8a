"""HFTokenizer + Vicuna masking arithmetic on a real fast tokenizer.

The byte fallback covers most tests; here a LLaMA-like BPE fast tokenizer is
built programmatically (Metaspace pre-tokenizer + BOS post-processor — the
same boundary-merge behavior sentencepiece has) so the
instruction_mask_offset=2 arithmetic the reference depends on
(utils/dataset.py:117) runs against real token boundaries.
"""

import numpy as np
import pytest

pytest.importorskip("tokenizers")
pytest.importorskip("transformers")

from llmseg_tpu.data import collate as collate_lib
from llmseg_tpu.data import conversation as conv_lib
from llmseg_tpu.data.prompts import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                     IMAGE_TOKEN_INDEX, SEG_TOKEN)
from llmseg_tpu.data.tokenizer import HFTokenizer, tokenizer_image_token


def _two_round_conversation() -> str:
    conv = conv_lib.conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0],
                        DEFAULT_IMAGE_TOKEN + "\nWhat can we wear on feet?")
    conv.append_message(conv.roles[1], "The shoes on the rack. [SEG].")
    conv.append_message(conv.roles[0], "Why those?")
    conv.append_message(conv.roles[1], "They fit feet. [SEG].")
    return conv.get_prompt()


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from tok_utils import build_tiny_fast_tokenizer

    text = _two_round_conversation()
    d = build_tiny_fast_tokenizer(
        str(tmp_path_factory.mktemp("tiny-llama-tok")),
        [text, text.replace("</s>", " ")])
    return HFTokenizer(d, model_max_length=512, use_mm_start_end=False)


def test_hf_tokenizer_basics(hf_tok):
    assert hf_tok.instruction_mask_offset == 2
    assert hf_tok.bos_token_id is not None
    sid = hf_tok.convert_tokens_to_ids(SEG_TOKEN)
    assert sid is not None and sid >= 0
    ids = hf_tok.encode("hello " + SEG_TOKEN)
    assert ids[0] == hf_tok.bos_token_id
    assert sid in ids


def test_tokenizer_image_token_hf(hf_tok):
    text = "USER: " + DEFAULT_IMAGE_TOKEN + "\nhi ASSISTANT: yo</s>"
    ids = tokenizer_image_token(text, hf_tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids[0] == hf_tok.bos_token_id
    # reference mm_utils.py:19-44 structure: [chunk0 ids | -200 | chunk1
    # ids without their BOS]
    c0, c1 = text.split(DEFAULT_IMAGE_TOKEN)
    e0, e1 = hf_tok.encode(c0), hf_tok.encode(c1)
    assert ids == e0 + [IMAGE_TOKEN_INDEX] + e1[1:]


def test_mask_targets_covers_answers_exactly(hf_tok):
    """Decoded unmasked spans == assistant answers + </s>, nothing else —
    the ground-truth semantics of the reference masking
    (utils/dataset.py:92-126)."""
    text = _two_round_conversation()
    ids = tokenizer_image_token(text, hf_tok)
    m = collate_lib.mask_targets(text, ids, hf_tok)
    kept = [int(i) for i, t in zip(ids, m) if t != IGNORE_INDEX]
    got = hf_tok.decode(kept)
    assert got.strip() == ("The shoes on the rack. [SEG].</s> "
                           "They fit feet. [SEG].</s>")


def test_mask_targets_equals_reference_algorithm(hf_tok):
    """Port of the reference's inline masking loop (utils/dataset.py:100-126,
    offset hard-coded -2) must produce the identical mask array."""
    conv = conv_lib.conv_templates["llava_v1"]
    text = _two_round_conversation()
    ids = tokenizer_image_token(text, hf_tok)

    target = np.asarray(ids, np.int64).copy()
    sep = conv.sep + conv.roles[1] + ": "
    rounds = text.split(conv.sep2)
    cur_len = 1
    target[:cur_len] = IGNORE_INDEX
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        assert len(parts) == 2
        parts[0] += sep
        round_len = len(tokenizer_image_token(rou, hf_tok))
        instruction_len = len(tokenizer_image_token(parts[0], hf_tok)) - 2
        target[cur_len:cur_len + instruction_len] = IGNORE_INDEX
        cur_len += round_len
    target[cur_len:] = IGNORE_INDEX

    ours = collate_lib.mask_targets(text, ids, hf_tok)
    np.testing.assert_array_equal(ours, target)


def test_collate_with_hf_tokenizer(hf_tok):
    text = _two_round_conversation()
    G = 16
    sample = {
        "images_dino": np.zeros((8, 8, 3), np.float32),
        "images_clip": np.zeros((8, 8, 3), np.float32),
        "conversations": [text],
        "segs": np.ones((3, G, G), np.float32),
        "ious": np.ones((1, 3), np.float32),
        "iops": np.ones((1, 3), np.float32),
    }
    batch, extras = collate_lib.collate(
        [sample], hf_tok, num_image_tokens=4, rows_per_sample=1,
        max_proposals=5, use_mm_start_end=False, model_max_length=256)
    T = 256 - 3
    assert batch["input_ids"].shape == (1, T)
    assert batch["row_valid"][0]
    pos = int(batch["image_pos"][0])
    assert pos > 0
    # the placeholder was consumed: no IMAGE_TOKEN_INDEX remains
    assert (batch["input_ids"] != IMAGE_TOKEN_INDEX).all()
    # unmasked labels decode to the two answers
    row_ids = batch["input_ids"][0]
    row_lab = batch["labels"][0]
    kept = [int(i) for i, t in zip(row_ids, row_lab) if t != IGNORE_INDEX]
    assert "[SEG]" in hf_tok.decode(kept)
