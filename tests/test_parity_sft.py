"""Cross-implementation parity for the LLaVA SFT preprocessing (M24):
our data/llava_sft.py vs the ACTUAL reference functions imported from
/root/reference/model/llava/train/train.py (preprocess_multimodal:314-343,
preprocess_v1:430-515, preprocess_plain:592-620), driven through a real HF
fast tokenizer so the round/masking arithmetic is exercised end to end."""

from __future__ import annotations

import copy
import sys

import numpy as np
import pytest

import reference_stubs

from llmseg_tpu.data import llava_sft as S
from llmseg_tpu.data.prompts import DEFAULT_IMAGE_TOKEN, IGNORE_INDEX
from llmseg_tpu.data.tokenizer import HFTokenizer
from tok_utils import build_tiny_fast_tokenizer


@pytest.fixture(scope="module")
def ref_train():
    reference_stubs.install()
    mdl = reference_stubs.REFERENCE_ROOT + "/model"
    if mdl not in sys.path:
        sys.path.insert(0, mdl)
    import llava.conversation as ref_conv
    import llava.train.train as ref_train_mod

    return ref_train_mod, ref_conv


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    """Tiny LLaMA-like fast tokenizer trained on the rendered test
    conversations (plus their </s>-stripped variants) so round-boundary
    re-tokenization merges exactly like sentencepiece does on real text —
    same recipe as tests/test_hf_tokenizer.py's hf_tok fixture."""
    corpus = []
    for src in (MULTI_TURN, MISPLACED_IMAGE):
        text = S.build_conversation(S.preprocess_multimodal([src])[0])
        corpus += [text, text.replace("</s>", " ")]
    corpus.append("a photography of a dog in a park\n")
    d = build_tiny_fast_tokenizer(
        str(tmp_path_factory.mktemp("sfttok")), corpus)
    return HFTokenizer(d, model_max_length=512, use_mm_start_end=False)


MULTI_TURN = [
    {"from": "human",
     "value": f"{DEFAULT_IMAGE_TOKEN}\nWhat is shown in the picture?"},
    {"from": "gpt",
     "value": "A dog chasing a red ball across wet grass near a fence."},
    {"from": "human", "value": "Is the animal moving quickly or slowly?"},
    {"from": "gpt", "value": "It moves quickly."},
]

MISPLACED_IMAGE = [
    {"from": "human",
     "value": f"Describe it in detail. {DEFAULT_IMAGE_TOKEN}"},
    {"from": "gpt", "value": "A dog in a park."},
]


def test_preprocess_multimodal_parity(ref_train):
    ref_mod, ref_conv = ref_train
    ref_conv.default_conversation = ref_conv.conv_templates["vicuna_v1"]
    for use_se in (False, True):
        class DataArgs:
            is_multimodal = True
            mm_use_im_start_end = use_se

        for src in (MULTI_TURN, MISPLACED_IMAGE):
            ref_out = ref_mod.preprocess_multimodal(
                copy.deepcopy([src]), DataArgs())
            ours = S.preprocess_multimodal(
                [src], mm_use_im_start_end=use_se)
            assert ours == ref_out, (use_se, src)


def _ref_v1(ref_train, tok, sources, has_image):
    ref_mod, ref_conv = ref_train
    ref_conv.default_conversation = ref_conv.conv_templates["vicuna_v1"]
    out = ref_mod.preprocess_v1(copy.deepcopy(sources), tok.tok,
                                has_image=has_image)
    return out["input_ids"], out["labels"]


@pytest.mark.parametrize("src", [MULTI_TURN, MISPLACED_IMAGE,
                                 [MULTI_TURN[1]] + MULTI_TURN],
                         ids=["multi_turn", "misplaced", "leading_gpt"])
def test_preprocess_v1_parity_has_image(ref_train, tok, src):
    src = S.preprocess_multimodal([src])[0]
    ref_ids, ref_labels = _ref_v1(ref_train, tok, [src], has_image=True)
    ((ids, labels),) = S.preprocess_v1([src], tok)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids[0].numpy())
    np.testing.assert_array_equal(labels, ref_labels[0].numpy())
    # sanity: the mask is non-trivial (some IGNORE, some supervised)
    assert (labels == IGNORE_INDEX).any() and (labels != IGNORE_INDEX).any()


def test_preprocess_v1_parity_text_only(ref_train, tok):
    src = [{"from": "human", "value": "What is shown in the picture?"},
           {"from": "gpt", "value": "It moves quickly."}]
    ref_ids, ref_labels = _ref_v1(ref_train, tok, [src], has_image=False)
    ((ids, labels),) = S.preprocess_v1([src], tok)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids[0].numpy())
    np.testing.assert_array_equal(labels, ref_labels[0].numpy())


def test_preprocess_plain_parity(ref_train, tok):
    ref_mod, ref_conv = ref_train
    ref_conv.default_conversation = ref_conv.conv_templates["plain"]
    src = [{"from": "human", "value": f"{DEFAULT_IMAGE_TOKEN}\n"},
           {"from": "gpt", "value": "a photography of a dog in a park"}]
    ref_out = ref_mod.preprocess_plain(copy.deepcopy([src]), tok.tok)
    ((ids, labels),) = S.preprocess_plain([src], tok)
    np.testing.assert_array_equal(np.asarray(ids),
                                  ref_out["input_ids"][0].numpy())
    np.testing.assert_array_equal(labels, ref_out["labels"][0].numpy())
