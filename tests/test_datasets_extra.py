"""Synthetic-corpus tests for the sem-seg and refer-seg dataset branches."""

import json
import os
import pickle

import numpy as np
import pytest

from llmseg_tpu.data import datasets as D
from llmseg_tpu.data.mask_reader import SamMaskReader
from llmseg_tpu.ops import rle as rle_lib


def _write_jpg(path, rng, h=40, w=48):
    import cv2

    cv2.imwrite(str(path), rng.randint(0, 255, (h, w, 3), np.uint8))


def _write_label_png(path, label):
    import cv2

    cv2.imwrite(str(path), label.astype(np.uint8))


def _masks_json(path, names, rng, h=40, w=48, k=3):
    doc = []
    for name in names:
        masks = []
        for _ in range(k):
            m = np.zeros((h, w), np.uint8)
            y, x = rng.randint(0, h - 8), rng.randint(0, w - 8)
            m[y:y + 8, x:x + 8] = 1
            masks.append({"segmentation": rle_lib.encode(m),
                          "area": int(m.sum()), "bbox": [x, y, 8, 8]})
        doc.append({"image": name, "target_size": [h, w], "masks": masks})
    path.write_text(json.dumps(doc))


def test_sem_seg_ade20k_branch(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path
    img_dir = root / "ade20k" / "images" / "training"
    ann_dir = root / "ade20k" / "annotations" / "training"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    (root / "ade20k" / "ade20k_classes.json").write_text(
        json.dumps(["wall", "building", "sky"]))
    names = []
    for i in range(2):
        _write_jpg(img_dir / f"a{i}.jpg", rng)
        label = np.zeros((40, 48), np.uint8)      # raw ade: 0=ignore, 1=wall
        label[:20] = 1
        label[20:] = 3                            # sky (raw id 3 -> idx 2)
        _write_label_png(ann_dir / f"a{i}.png", label)
        names.append(f"a{i}.jpg")
    _masks_json(root / "ade_masks.json", names, rng)
    reader = SamMaskReader(str(root / "ade_masks.json"), verbose=False)
    ds = D.SemSegDataset(str(root), readers={"ade20k": reader},
                         sem_seg_data="ade20k", image_size=56, seg_grid=16,
                         num_classes_per_sample=2, seed=0)
    s = ds[0]
    assert s["segs"].shape == (3, 16, 16)
    assert s["masks"].shape[0] >= 1
    assert "segment the" in s["conversations"][0]
    assert s["ious"].shape[1] == 3


def test_refer_seg_branch(tmp_path):
    rng = np.random.RandomState(1)
    data_dir = tmp_path / "refer_seg"
    ds_dir = data_dir / "refcoco"
    img_dir = data_dir / "images" / "mscoco" / "images" / "train2014"
    ds_dir.mkdir(parents=True)
    img_dir.mkdir(parents=True)

    _write_jpg(img_dir / "COCO_train2014_000000000001.jpg", rng)
    instances = {
        "images": [{"id": 1, "height": 40, "width": 48,
                    "file_name": "COCO_train2014_000000000001.jpg"}],
        "annotations": [{"id": 10, "image_id": 1, "category_id": 5,
                         "bbox": [4, 4, 10, 10],
                         "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]]}],
        "categories": [{"id": 5, "name": "bench"}],
    }
    (ds_dir / "instances.json").write_text(json.dumps(instances))
    refs = [{"ref_id": 0, "ann_id": 10, "image_id": 1, "category_id": 5,
             "split": "train",
             "sentences": [{"sent_id": 0, "sent": "the left bench",
                            "tokens": ["the", "left", "bench"]}],
             "file_name": "COCO_train2014_000000000001.jpg"}]
    with open(ds_dir / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)

    _masks_json(tmp_path / "coco14_masks.json",
                ["COCO_train2014_000000000001.jpg"], rng)
    reader = SamMaskReader(str(tmp_path / "coco14_masks.json"), verbose=False)
    ds = D.ReferSegDataset(str(tmp_path), coco2014_reader=reader,
                           saiapr_reader=reader, refer_seg_data="refcoco",
                           image_size=56, seg_grid=16, seed=0)
    s = ds[0]
    assert "the left bench" in s["conversations"][0]
    assert s["masks"][0].sum() > 0            # polygon rasterized
    assert s["masks"][0].shape == (40, 48)
    assert 0 <= s["ious"].max() <= 1


def test_vqa_branch(tmp_path):
    rng = np.random.RandomState(2)
    (tmp_path / "llava_dataset").mkdir()
    (tmp_path / "coco" / "train2017").mkdir(parents=True)
    _write_jpg(tmp_path / "coco" / "train2017" / "v1.jpg", rng)
    doc = [{"image": "v1.jpg", "conversations": [
        {"from": "human", "value": "<image>\nWhat is shown?"},
        {"from": "gpt", "value": "A random pattern."}]}]
    (tmp_path / "llava_dataset" / "llava_instruct_150k.json").write_text(
        json.dumps(doc))
    _masks_json(tmp_path / "vqa_masks.json", ["v1.jpg"], rng)
    reader = SamMaskReader(str(tmp_path / "vqa_masks.json"), verbose=False)
    ds = D.VQADataset(str(tmp_path), coco2017_reader=reader,
                      image_size=56, seg_grid=16, seed=0)
    s = ds[0]
    assert "What is shown?" in s["conversations"][0]
    assert "[SEG]" not in s["conversations"][0]
    assert s["ious"].shape == (1, 3)
    assert s["masks"] is None


def test_grefer_multi_ann_union(tmp_path):
    """G_REFER refs aggregating multiple ann_ids (and -1 no-target)."""
    from llmseg_tpu.data.refer import G_REFER

    ds_dir = tmp_path / "grefcoco"
    ds_dir.mkdir()
    instances = {
        "images": [{"id": 1, "height": 20, "width": 20, "file_name": "x.jpg"}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 5,
             "bbox": [0, 0, 5, 5],
             "segmentation": [[0, 0, 5, 0, 5, 5, 0, 5]]},
            {"id": 11, "image_id": 1, "category_id": 5,
             "bbox": [10, 10, 5, 5],
             "segmentation": [[10, 10, 15, 10, 15, 15, 10, 15]]},
        ],
        "categories": [{"id": 5, "name": "thing"}],
    }
    (ds_dir / "instances.json").write_text(json.dumps(instances))
    refs = [
        {"ref_id": 0, "ann_id": [10, 11], "image_id": 1, "category_id": 5,
         "split": "train",
         "sentences": [{"sent_id": 0, "sent": "both things"}]},
        {"ref_id": 1, "ann_id": [-1], "image_id": 1, "category_id": 5,
         "split": "train",
         "sentences": [{"sent_id": 1, "sent": "nothing here"}]},
    ]
    with open(ds_dir / "grefs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    api = G_REFER(str(tmp_path), "grefcoco", "unc")
    m0 = api.getMask(api.Refs[0])["mask"]
    assert m0[2, 2] == 1 and m0[12, 12] == 1    # union of both anns
    assert m0[2, 12] == 0
    m1 = api.getMask(api.Refs[1])["mask"]
    assert m1.sum() == 0                        # no-target ref
