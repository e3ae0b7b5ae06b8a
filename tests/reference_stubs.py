"""Make the torch reference at /root/reference importable for parity tests.

The reference depends on torchvision / pycocotools / skimage, none of which
are in this image.  These stubs implement exactly the small surface the
reference's import-time and AMG/selection-head code paths touch:

  * torchvision.ops.boxes.batched_nms / box_area / nms — pure-torch greedy
    NMS with torchvision's semantics (per-category via coordinate offsets,
    descending-score order, keep-over-threshold strictly-greater suppress).
  * torchvision.transforms.functional.resize / to_pil_image — PIL-backed
    bilinear resize, matching torchvision's PIL path (what the reference's
    ResizeLongestSide.apply_image uses, segment_anything/utils/transforms.py).
  * skimage / skimage.transform / skimage.io — import-time placeholders
    (reference utils/*.py import them at module top; the functions parity
    tests exercise don't call them).

Parity tests import the reference THROUGH this module so every test agrees
on one stub implementation.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _mkpkg(name: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    m.__path__ = []  # mark as package so submodule imports resolve
    sys.modules[name] = m
    parent, _, child = name.rpartition(".")
    if parent:
        setattr(_mkpkg(parent), child, m)
    return m


def _install_torchvision() -> None:
    import torch

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def nms(boxes, scores, iou_threshold):
        """Greedy NMS, torchvision semantics: sort by score descending,
        suppress boxes with IoU strictly greater than the threshold."""
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(int(i))
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            union = box_area(boxes[i:i + 1]) + box_area(boxes[rest]) - inter
            iou = inter / union
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty(0, dtype=torch.long)
        # torchvision trick: offset each category into a disjoint coordinate
        # range so one NMS pass never crosses categories
        offsets = idxs.to(boxes) * (boxes.max() + 1)
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    tv = _mkpkg("torchvision")
    ops = _mkpkg("torchvision.ops")
    boxes_mod = _mkpkg("torchvision.ops.boxes")
    boxes_mod.box_area = box_area
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    ops.boxes = boxes_mod
    ops.nms = nms
    ops.batched_nms = batched_nms

    from PIL import Image
    import numpy as np

    def to_pil_image(x):
        if hasattr(x, "numpy"):
            x = x.numpy()
        return Image.fromarray(np.asarray(x))

    def resize(img, size, *a, **k):
        # torchvision PIL path: size is (h, w); PIL wants (w, h)
        if isinstance(img, Image.Image):
            return img.resize(size[::-1], Image.BILINEAR)
        raise NotImplementedError("stub resize supports PIL images only")

    tfm = _mkpkg("torchvision.transforms")
    fn = _mkpkg("torchvision.transforms.functional")
    fn.resize = resize
    fn.to_pil_image = to_pil_image
    tfm.functional = fn
    tv.transforms = tfm


def _install_skimage() -> None:
    import numpy as np

    _mkpkg("skimage")
    _mkpkg("skimage.io")
    tr = _mkpkg("skimage.transform")

    def resize(image, output_shape, *, order=None, anti_aliasing=None,
               preserve_range=False, **k):
        """Order-0 (nearest) only — the one mode the reference's metric
        helpers use (utils/utils.py:240,258: order=0, anti_aliasing=False,
        preserve_range=True).  Half-pixel-center mapping with
        round-half-even, skimage's nearest convention."""
        if order != 0 or anti_aliasing:
            raise NotImplementedError(
                "skimage stub resize supports order=0, no anti-aliasing")
        H, W = output_shape[:2]
        h, w = image.shape[:2]
        rows = np.clip(np.rint((np.arange(H) + 0.5) * h / H - 0.5)
                       .astype(int), 0, h - 1)
        cols = np.clip(np.rint((np.arange(W) + 0.5) * w / W - 0.5)
                       .astype(int), 0, w - 1)
        return image[rows[:, None], cols[None, :]]

    tr.resize = resize


def _patch_hf_register() -> None:
    """Installed transformers (4.5x) already ships a 'llava' config; the
    vendored reference llava re-registers the name at import time
    (llava_llama.py:166-167).  Make duplicate registration a no-op so the
    reference modules import."""
    from transformers import AutoConfig, AutoModelForCausalLM

    for auto in (AutoConfig, AutoModelForCausalLM):
        orig = auto.register  # bound static/classmethod -> plain callable

        def tolerant(*a, _orig=orig, **k):
            try:
                return _orig(*a, **k)
            except (ValueError, TypeError):
                return None

        auto.register = staticmethod(tolerant)


def _stub_mpt_branch() -> None:
    """The reference's dormant MPT branch (SURVEY M21, never selected at
    runtime) imports transformers internals removed in 4.x
    (bloom._expand_mask).  Pre-register a placeholder so
    model/llava/model/__init__.py:2 imports without pulling it in."""
    # both package spellings: "model.llava..." (reference root on sys.path)
    # and "llava..." (model/ on sys.path, used by llava/train/train.py's
    # absolute imports)
    for name in ("model.llava.model.language_model.llava_mpt",
                 "llava.model.language_model.llava_mpt"):
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        m.LlavaMPTConfig = type("LlavaMPTConfig", (), {})
        m.LlavaMPTForCausalLM = type("LlavaMPTForCausalLM", (), {})
        sys.modules[name] = m


def install() -> str:
    """Install stubs + reference sys.path; returns the reference root."""
    _install_torchvision()
    _install_skimage()
    _patch_hf_register()
    _stub_mpt_branch()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
