"""CLI smoke tests: arg parsing -> config, and the prepare pipeline
end-to-end with a tiny SAM over synthetic images."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_parser_to_config():
    from cli import common

    args = common.build_parser("t").parse_args(
        ["--lr", "2e-4", "--sample_rates", "2,1", "--dataset",
         "sem_seg||reason_seg", "--model_size", "tiny", "--mesh_tp", "2"])
    cfg = common.to_config(args)
    assert cfg.train.lr == 2e-4
    assert cfg.data.sample_rates == (2.0, 1.0)
    assert cfg.train.mesh.tensor == 2
    assert cfg.model.max_proposals == 8  # tiny preset


@pytest.mark.slow
def test_prepare_cli_end_to_end(tmp_path, monkeypatch):
    import cv2

    from cli import prepare as prepare_cli
    from llmseg_tpu import config as C
    from llmseg_tpu.data.mask_reader import SamMaskReader
    from llmseg_tpu.models.sam import sam as sam_lib

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8))

    # monkeypatch the registry to the tiny config + permissive AMG so random
    # weights still produce proposals
    monkeypatch.setitem(sam_lib.MODEL_REGISTRY, "vit_h", C.sam_tiny)
    orig_amg = C.AMGConfig

    def loose_amg(**kw):
        kw.update(pred_iou_thresh=-1e9, stability_score_thresh=-1.0,
                  max_masks=16)
        return orig_amg(**kw)

    monkeypatch.setattr(prepare_cli.C, "AMGConfig", loose_amg)

    out = tmp_path / "masks.json"
    h5 = tmp_path / "masks.h5"
    prepare_cli.main(["--image_dir", str(img_dir), "--output", str(out),
                      "--points_per_side", "4", "--points_per_batch", "8",
                      "--hdf5", str(h5)])
    doc = json.loads(out.read_text())
    assert len(doc) == 2
    assert doc[0]["target_size"] == [48, 64]

    # readable by the training-side reader when proposals survived
    if doc[0]["masks"]:
        reader = SamMaskReader(str(out), verbose=False)
        segs = reader.extract_sam_segs(doc[0]["image"])
        assert segs["segs_origin"].shape[:2] == (48, 64)

    # h5 -> json converter reproduces the record
    from cli.convert_h5 import convert

    out2 = tmp_path / "masks2.json"
    n = convert(str(h5), str(out2))
    assert n == 2
    doc2 = json.loads(out2.read_text())
    assert {d["image"] for d in doc2} == {d["image"] for d in doc}


def test_sharding_args(tmp_path, monkeypatch):
    from cli import prepare as prepare_cli

    # shard selection is pure list slicing; verify round-robin semantics
    files = [f"f{i}" for i in range(10)]
    assert files[1::4] == ["f1", "f5", "f9"]


def test_apply_overrides():
    from llmseg_tpu import config as C

    cfg = C.ExperimentConfig()
    cfg2 = C.apply_overrides(cfg, {"train.lr": 5e-5,
                                   "model.max_proposals": 32})
    assert cfg2.train.lr == 5e-5
    assert cfg2.model.max_proposals == 32
    assert cfg.train.lr == 1e-4  # original untouched (frozen dataclasses)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """cli.train main(): args -> config -> datasets -> Trainer -> epoch +
    eval + best checkpoint, on a synthetic ReasonSeg corpus (covers the T1
    user surface, reference scripts/train_10epoch.sh)."""
    import cv2
    import json as json_lib

    from llmseg_tpu.ops import rle as rle_lib

    rng = np.random.RandomState(0)
    dataset_dir = tmp_path / "dataset"
    masks_dir = tmp_path / "sam_masks"
    masks_dir.mkdir()
    h, w = 60, 80
    for split in ("train", "val"):
        d = dataset_dir / "reason_seg" / "ReasonSeg" / split
        d.mkdir(parents=True)
        doc = []
        for i in range(2):
            name = f"img{i}.jpg"
            cv2.imwrite(str(d / name),
                        rng.randint(0, 255, (h, w, 3), np.uint8))
            (d / f"img{i}.json").write_text(json_lib.dumps({
                "shapes": [{"label": "target",
                            "points": [[5, 5], [30, 5], [30, 30], [5, 30]]}],
                "text": [f"the thing {i}"], "is_sentence": False}))
            masks = []
            for _ in range(3):
                m = np.zeros((h, w), np.uint8)
                y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
                m[y:y + 10, x:x + 10] = 1
                masks.append({"segmentation": rle_lib.encode(m),
                              "area": int(m.sum()),
                              "bbox": [float(x), float(y), 9.0, 9.0],
                              "predicted_iou": 0.9, "stability_score": 0.97,
                              "point_coords": [[1.0, 1.0]],
                              "crop_box": [0, 0, w, h]})
            doc.append({"image": name, "target_size": [h, w],
                        "masks": masks})
        (masks_dir / f"ReasonSeg_{split}_masks.json").write_text(
            json_lib.dumps(doc))

    from cli import train as train_cli

    log_dir = tmp_path / "runs"
    argv = ["--model_size", "tiny", "--precision", "fp32",
            "--dataset", "reason_seg", "--sample_rates", "1",
            "--dataset_dir", str(dataset_dir),
            "--sam_masks_dir", str(masks_dir),
            "--epochs", "1", "--steps_per_epoch", "2",
            "--grad_accumulation_steps", "1", "--warmup_steps", "1",
            "--num_classes_per_sample", "1",
            "--image_size", "56", "--model_max_length", "512",
            "--log_base_dir", str(log_dir), "--exp_name", "smoke"]
    train_cli.main(argv)
    run_dir = log_dir / "smoke"
    assert (run_dir / "ckpt").exists() or (run_dir / "best_meta.json").exists()

    # eval-only path on the checkpoint we just produced (T3-style)
    res = train_cli.main(argv + ["--eval_only", "--auto_resume"])
    assert res is not None and "giou" in res

    # int8 weight-only inference (reference load_8bit, builder.py:40-47)
    res8 = train_cli.main(argv + ["--eval_only", "--load_8bit"])
    assert res8 is not None and "giou" in res8

    # W8A8 inference (activation quant + s8 x s8 matmuls) through the CLI
    resw = train_cli.main(argv + ["--eval_only", "--load_8bit", "--w8a8"])
    assert resw is not None and "giou" in resw

    # quantized load is fenced out of training (no silent no-op knobs)
    with pytest.raises(SystemExit):
        train_cli.main(argv + ["--load_8bit"])
    # --w8a8 is int8-only and never a silent no-op
    with pytest.raises(SystemExit):
        train_cli.main(argv + ["--eval_only", "--w8a8"])
    with pytest.raises(SystemExit):
        train_cli.main(argv + ["--eval_only", "--load_4bit", "--w8a8"])


@pytest.mark.slow
def test_finetune_and_validate_cli(tmp_path):
    """cli.finetune (stage-2 on LLM-Seg40K, weights-only resume) and
    cli.validate (eval-only wrapper) on a synthetic corpus (T2 + T3 user
    surfaces, reference scripts/finetune_llmseg.sh + validate_llmseg40k.sh)."""
    import cv2
    import json as json_lib

    from llmseg_tpu.ops import rle as rle_lib

    rng = np.random.RandomState(0)
    dataset_dir = tmp_path / "dataset"
    masks_dir = tmp_path / "sam_masks"
    masks_dir.mkdir()
    coco = dataset_dir / "coco" / "train2017"
    coco.mkdir(parents=True)
    ego = dataset_dir / "ego_objects" / "images"
    ego.mkdir(parents=True)
    (dataset_dir / "llm_seg").mkdir()
    h, w = 60, 80
    gt = np.zeros((h, w), np.uint8)
    gt[10:30, 10:40] = 1
    names = ["c1.jpg", "c2.jpg"]
    for n in names:
        cv2.imwrite(str(coco / n), rng.randint(0, 255, (h, w, 3), np.uint8))
    doc = {n: {"from_dataset": "coco", "qa_pairs": [
        {"question": "What can we use to cut?",
         "answer": "The knife [SEG].",
         "rle_seg": rle_lib.encode(gt)}]} for n in names}
    (dataset_dir / "llm_seg" / "train.json").write_text(json_lib.dumps(doc))
    (dataset_dir / "llm_seg" / "validation.json").write_text(
        json_lib.dumps(doc))

    def masks_json(path):
        out = []
        for n in names:
            masks = []
            for _ in range(3):
                m = np.zeros((h, w), np.uint8)
                y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
                m[y:y + 10, x:x + 10] = 1
                masks.append({"segmentation": rle_lib.encode(m),
                              "area": int(m.sum()),
                              "bbox": [float(x), float(y), 9.0, 9.0],
                              "predicted_iou": 0.9, "stability_score": 0.97,
                              "point_coords": [[1.0, 1.0]],
                              "crop_box": [0, 0, w, h]})
            out.append({"image": n, "target_size": [h, w], "masks": masks})
        path.write_text(json_lib.dumps(out))

    for key in ("llmseg40k_train_masks", "llmseg40k_val_masks",
                "egoobjects_masks"):
        masks_json(masks_dir / f"{key}.json")

    from cli import finetune as ft_cli
    from cli import validate as val_cli

    log_dir = tmp_path / "runs"
    base = ["--model_size", "tiny", "--precision", "fp32",
            "--dataset_dir", str(dataset_dir),
            "--sam_masks_dir", str(masks_dir),
            "--epochs", "1", "--steps_per_epoch", "2",
            "--grad_accumulation_steps", "1", "--warmup_steps", "1",
            "--image_size", "56", "--model_max_length", "512",
            "--log_base_dir", str(log_dir), "--exp_name", "ft"]
    ft_cli.main(base)
    assert (log_dir / "ft").exists()

    res = val_cli.main(base + ["--dataset", "reason_seg",
                               "--val_dataset", "LLMSeg|val"])
    assert res is not None and "giou" in res


@pytest.mark.slow
def test_train_cli_with_hf_weights(tmp_path):
    """The real user path: cli.train --version <HF LLaVA dir> — HF fast
    tokenizer, imported LLaMA+projector weights, [SEG] vocab growth
    (reference README weight-acquisition flow)."""
    import cv2
    import json as json_lib
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from tok_utils import add_tiny_llava_weights, build_tiny_fast_tokenizer

    from llmseg_tpu.data import conversation as conv_lib
    from llmseg_tpu.ops import rle as rle_lib

    # HF dir: tokenizer trained on the llava_v1 prompt + tiny LLaMA weights
    conv = conv_lib.conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhat is the thing 0?")
    conv.append_message(conv.roles[1], "It is [SEG].")
    hf_dir = str(tmp_path / "llava")
    build_tiny_fast_tokenizer(hf_dir, [conv.get_prompt(), "the thing 1"])
    add_tiny_llava_weights(hf_dir, vocab_size=620)

    rng = np.random.RandomState(0)
    dataset_dir = tmp_path / "dataset"
    masks_dir = tmp_path / "sam_masks"
    masks_dir.mkdir()
    h, w = 60, 80
    for split in ("train", "val"):
        d = dataset_dir / "reason_seg" / "ReasonSeg" / split
        d.mkdir(parents=True)
        doc = []
        for i in range(2):
            name = f"img{i}.jpg"
            cv2.imwrite(str(d / name),
                        rng.randint(0, 255, (h, w, 3), np.uint8))
            (d / f"img{i}.json").write_text(json_lib.dumps({
                "shapes": [{"label": "target",
                            "points": [[5, 5], [30, 5], [30, 30], [5, 30]]}],
                "text": [f"the thing {i}"], "is_sentence": False}))
            masks = []
            for _ in range(3):
                m = np.zeros((h, w), np.uint8)
                y, x = rng.randint(0, h - 20), rng.randint(0, w - 20)
                m[y:y + 20, x:x + 20] = 1
                masks.append(
                    {"segmentation": rle_lib.encode(m), "area": int(m.sum()),
                     "bbox": [float(x), float(y), 19.0, 19.0],
                     "predicted_iou": 0.9, "stability_score": 0.97,
                     "point_coords": [[1.0, 1.0]],
                     "crop_box": [0, 0, w, h]})
            doc.append({"image": name, "target_size": [h, w],
                        "masks": masks})
        (masks_dir / f"ReasonSeg_{split}_masks.json").write_text(
            json_lib.dumps(doc))

    from cli import train as train_cli

    argv = ["--model_size", "tiny", "--precision", "fp32",
            "--version", hf_dir,
            "--dataset", "reason_seg", "--sample_rates", "1",
            "--dataset_dir", str(dataset_dir),
            "--sam_masks_dir", str(masks_dir),
            "--epochs", "1", "--steps_per_epoch", "2",
            "--grad_accumulation_steps", "1", "--warmup_steps", "1",
            "--num_classes_per_sample", "1",
            "--image_size", "56", "--model_max_length", "512",
            "--log_base_dir", str(tmp_path / "runs"),
            "--exp_name", "hf_smoke", "--no_eval"]
    train_cli.main(argv)
    assert (tmp_path / "runs" / "hf_smoke").exists()
