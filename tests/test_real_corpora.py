"""Guarded smokes against REAL dataset corpora (VERDICT r2 #8).

The synthetic-fixture tests (test_datasets*.py) prove the loader logic; these
prove the loaders against the real on-disk layouts (ade20k/cocostuff/
refcoco/...).  They run only when LLMSEG_DATASET_DIR points at a dataset
root laid out as the reference README describes (the same tree
cli/train.py consumes); each test additionally skips if its own corpus
subtree is absent, so partial dataset installs still get coverage.

Schema drift vs a real corpus then becomes a test failure here instead of a
crash hours into training.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest

DATA = os.environ.get("LLMSEG_DATASET_DIR", "")

pytestmark = pytest.mark.skipif(
    not DATA, reason="LLMSEG_DATASET_DIR not set (real-corpus smokes)")


def _need(*parts: str) -> str:
    path = os.path.join(DATA, *parts)
    if not os.path.exists(path):
        pytest.skip(f"corpus piece missing: {path}")
    return path


@pytest.mark.parametrize("name", ["ade20k", "cocostuff", "mapillary"])
def test_sem_seg_label_corpora(name):
    """init_* index builders parse the real class files + pair image/label
    paths that actually exist (reference sem_seg_dataset.py:21-125)."""
    from llmseg_tpu.data.datasets import SEM_SEG_INITS

    marker = {"ade20k": ("ade20k", "ade20k_classes.json"),
              "cocostuff": ("cocostuff", "cocostuff_classes.txt"),
              "mapillary": ("mapillary", "config_v2.0.json")}[name]
    _need(*marker)
    classes, images, labels = SEM_SEG_INITS[name](DATA)
    assert len(classes) > 0
    assert len(images) == len(labels) > 0
    assert os.path.exists(images[0]), images[0]
    assert os.path.exists(labels[0]), labels[0]
    from PIL import Image

    lab = np.asarray(Image.open(labels[0]))
    assert lab.ndim in (2, 3) and lab.size > 0


@pytest.mark.parametrize("name", ["paco_lvis", "pascal_part"])
def test_sem_seg_coco_style_corpora(name):
    from llmseg_tpu.data.datasets import SEM_SEG_INITS

    marker = {"paco_lvis": ("vlpart", "paco", "annotations",
                            "paco_lvis_v1_train.json"),
              "pascal_part": ("vlpart", "pascal_part", "train.json")}[name]
    _need(*marker)
    class_map, img_ids, api = SEM_SEG_INITS[name](DATA)
    assert len(class_map) > 0 and len(img_ids) > 0
    info = api.loadImgs([img_ids[0]])[0]
    assert "file_name" in info
    anns = api.loadAnns(api.getAnnIds(imgIds=[info["id"]]))
    if anns:
        m = api.annToMask(anns[0])
        assert m.shape == (info["height"], info["width"])


@pytest.mark.parametrize("ds,split", [("refcoco", "unc"),
                                      ("refcoco+", "unc"),
                                      ("refcocog", "umd"),
                                      ("refclef", "unc")])
def test_refer_corpora(ds, split):
    """REFER index over the real pickles + instances.json; getMask decodes
    the first ref (reference utils/refer.py:43-391)."""
    from llmseg_tpu.data.refer import REFER

    _need("refer_seg", ds)
    refer = REFER(os.path.join(DATA, "refer_seg"), ds, split)
    ref_ids = refer.getRefIds(split="train")
    assert len(ref_ids) > 0
    ref = refer.loadRefs(ref_ids[:1])[0]
    assert ref["sentences"] and "sent" in ref["sentences"][0]
    m = refer.getMask(ref)["mask"]
    assert m.ndim == 2 and m.sum() > 0


def test_grefcoco_corpus():
    from llmseg_tpu.data.refer import G_REFER

    _need("refer_seg", "grefcoco")
    refer = G_REFER(os.path.join(DATA, "refer_seg"))
    ref_ids = refer.getRefIds(split="train")
    assert len(ref_ids) > 0
    ref = refer.loadRefs(ref_ids[:1])[0]
    assert ref["sentences"]


def test_vqa_corpus():
    """llava_instruct_150k schema: image + human/gpt conversation turns
    (reference utils/vqa_dataset.py:32-176)."""
    path = _need("llava_dataset", "llava_instruct_150k.json")
    with open(path) as f:
        data = json.load(f)
    assert len(data) > 0
    item = data[0]
    assert "image" in item and "conversations" in item
    assert item["conversations"][0]["from"] in ("human", "gpt")
    img = os.path.join(DATA, "coco/train2017", item["image"])
    assert os.path.exists(img), img


def test_reason_seg_corpus():
    """ReasonSeg LabelMe-style polygon jsons rasterize
    (reference utils/data_processing.py:9-60)."""
    d = _need("reason_seg", "ReasonSeg", "train")
    jpgs = sorted(glob.glob(os.path.join(d, "*.jpg")))
    assert jpgs, "no ReasonSeg train images"
    import cv2

    from llmseg_tpu.data.data_processing import get_mask_from_json

    img = cv2.imread(jpgs[0])
    mask, sents, is_sentence = get_mask_from_json(
        jpgs[0].replace(".jpg", ".json"), img)
    assert mask.shape == img.shape[:2]
    assert len(sents) > 0


def test_llmseg40k_corpus():
    """LLM-Seg40K finetuning json schema (reference
    utils/llm_seg_dataset.py:65-95)."""
    path = os.path.join(DATA, "llm_seg", "train.json")
    if not os.path.exists(path):
        pytest.skip(f"corpus piece missing: {path}")
    with open(path) as f:
        data = json.load(f)
    item = data[0]
    assert "image" in item
    qa = item.get("qa_pairs") or item.get("QA") or []
    assert qa, f"unexpected LLMSeg40K record keys: {list(item)}"
