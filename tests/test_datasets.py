"""Integration: synthetic dataset trees -> datasets -> collate -> model."""

import json
import os

import numpy as np
import pytest

from llmseg_tpu.data import datasets as D
from llmseg_tpu.data.collate import collate
from llmseg_tpu.data.mask_reader import SamMaskReader
from llmseg_tpu.data.tokenizer import ByteTokenizer
from llmseg_tpu.ops import rle as rle_lib


def _write_jpg(path, rng, h=60, w=80):
    import cv2

    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    cv2.imwrite(str(path), img)
    return img


def _masks_json(path, image_names, rng, h=60, w=80, k=4):
    doc = []
    for name in image_names:
        masks = []
        for _ in range(k):
            m = np.zeros((h, w), np.uint8)
            y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
            m[y:y + 10, x:x + 10] = 1
            masks.append({"segmentation": rle_lib.encode(m),
                          "area": int(m.sum()),
                          "bbox": [float(x), float(y), 10.0, 10.0],
                          "predicted_iou": 0.9, "stability_score": 0.97,
                          "point_coords": [[1.0, 1.0]],
                          "crop_box": [0, 0, w, h]})
        doc.append({"image": name, "target_size": [h, w], "masks": masks})
    path.write_text(json.dumps(doc))


@pytest.fixture
def reason_tree(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "dataset"
    for split in ("train", "val"):
        d = root / "reason_seg" / "ReasonSeg" / split
        d.mkdir(parents=True)
        names = []
        for i in range(2):
            name = f"img{i}.jpg"
            _write_jpg(d / name, rng)
            anno = {"shapes": [{"label": "target",
                                "points": [[5, 5], [30, 5], [30, 30], [5, 30]]}],
                    "text": [f"the thing {i}", "another phrase"],
                    "is_sentence": False}
            (d / f"img{i}.json").write_text(json.dumps(anno))
            names.append(name)
        _masks_json(root / f"masks_{split}.json", names, rng)
    return root


@pytest.mark.slow
def test_reason_seg_dataset_to_model(reason_tree):
    import jax

    from llmseg_tpu import config as C
    from llmseg_tpu.models import llmseg

    readers = {s: SamMaskReader(str(reason_tree / f"masks_{s}.json"),
                                verbose=False) for s in ("train", "val")}
    cfg = C.llmseg_tiny()
    ds = D.ReasonSegDataset(str(reason_tree), readers,
                            samples_per_epoch=4, seed=0,
                            image_size=cfg.dino.img_size,
                            seg_grid=cfg.seg_grid,
                            num_classes_per_sample=2)
    sample = ds[0]
    assert sample["images_dino"].shape == (cfg.dino.img_size,
                                           cfg.dino.img_size, 3)
    assert sample["segs"].shape[1:] == (cfg.seg_grid, cfg.seg_grid)
    assert sample["ious"].shape == sample["iops"].shape
    assert 0 <= sample["ious"].max() <= 1

    # sample -> collate -> tiny model loss (clip size must match tiny cfg)
    sample["images_clip"] = np.zeros(
        (cfg.llava.vision.img_size, cfg.llava.vision.img_size, 3), np.float32)
    tok = ByteTokenizer(model_max_length=480)
    tok._specials["[SEG]"] = cfg.seg_token_id  # align ids with tiny config
    batch, extras = collate([sample], tok,
                            num_image_tokens=cfg.llava.num_image_tokens,
                            rows_per_sample=2,
                            max_proposals=cfg.max_proposals)
    assert not extras["inference"]
    params = llmseg.init(jax.random.PRNGKey(0), cfg)
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    total, aux = llmseg.loss_fn(params, cfg, batch)
    assert np.isfinite(float(total))
    # loss must be REAL: rows survive truncation ([SEG] intact) and CE sees
    # unmasked answer tokens — guards against silent full-truncation (loss==0)
    assert float(total) > 0.1
    assert float(aux["ce_loss"]) > 0.0


def test_val_reason_seg(reason_tree):
    reader = SamMaskReader(str(reason_tree / "masks_val.json"), verbose=False)
    ds = D.ValReasonSegDataset(str(reason_tree), reader, image_size=56,
                               seg_grid=16)
    assert len(ds) == 2
    s = ds[0]
    assert s["inference"]
    assert s["segs_origin"] is not None
    assert s["conversations"][0].count("[SEG]") == 1
    assert s["masks"].shape[0] == 1


def test_llmseg40k_dataset(tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    img_dir = tmp_path / "coco"
    img_dir.mkdir()
    _write_jpg(img_dir / "c1.jpg", rng)
    gt = np.zeros((60, 80), np.uint8)
    gt[10:30, 10:40] = 1
    doc = {"c1.jpg": {"from_dataset": "coco", "qa_pairs": [
        {"question": "What can we use to cut?",
         "answer": "The knife [SEG].",
         "rle_seg": rle_lib.encode(gt)}]}}
    jp = tmp_path / "train.json"
    jp.write_text(json.dumps(doc))
    _masks_json(tmp_path / "masks.json", ["c1.jpg"], rng)
    reader = SamMaskReader(str(tmp_path / "masks.json"), verbose=False)
    ds = D.LLMSegDataset(str(jp), str(img_dir), str(img_dir), reader, reader,
                         image_size=56, seg_grid=16)
    assert len(ds) == 1
    s = ds[0]
    assert "What can we use to cut?" in s["conversations"][0]
    assert s["ious"].shape == (1, 4)

    val = D.ValLLMSegDataset(str(jp), str(img_dir), str(img_dir), reader,
                             reader, limit=100, image_size=56, seg_grid=16)
    assert len(val) == 1
    assert val[0]["inference"]


def test_hybrid_mixture(reason_tree):
    readers = {s: SamMaskReader(str(reason_tree / f"masks_{s}.json"),
                                verbose=False) for s in ("train", "val")}
    ds = D.ReasonSegDataset(str(reason_tree), readers, samples_per_epoch=10,
                            image_size=56, seg_grid=16, seed=1)
    hybrid = D.HybridDataset([ds, ds], [9, 1], samples_per_epoch=10, seed=2)
    assert len(hybrid) == 10
    s = hybrid[3]
    assert s["images_dino"].shape == (56, 56, 3)
