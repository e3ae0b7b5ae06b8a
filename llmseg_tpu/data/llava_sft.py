"""LLaVA supervised-finetuning data stack (reference M24,
model/llava/train/train.py).

Capability parity with the vendored LLaVA training stack's data side:
  * ``preprocess_multimodal``   — train.py:314-343 (normalize the <image>
    placeholder to the front of the first turn, optional <im_start>/<im_end>
    wrapping);
  * ``preprocess_plain``        — train.py:592-620 (feature-alignment
    pretrain masking: everything before the caption is IGNORE);
  * ``preprocess_v1``           — train.py:430-515 (Vicuna-round
    instruction masking; same arithmetic as data/collate.mask_targets);
  * ``SFTDataset``              — train.py:681-762 (LazySupervisedDataset:
    lazy json list of {image?, conversations}, "pad" aspect-ratio
    expand2square with the CLIP-mean background, zero image for text-only
    samples in a multimodal run);
  * ``sft_collate``             — train.py:763-795 (DataCollatorFor-
    SupervisedDataset) — except STATIC-SHAPE: every batch pads text to
    ``model_max_length - (num_image_tokens - 1)`` so the spliced sequence
    is exactly model_max_length and XLA compiles one program.

Text-only rows keep a static layout too: the collator points ``image_pos``
at the first padding slot and clears ``has_image``; the model zeroes that
row's image embeddings, so the splice inserts zero vectors into the padded
tail where causal attention cannot reach real tokens.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from llmseg_tpu.data import conversation as conv_lib
from llmseg_tpu.data import image_ops
from llmseg_tpu.data.collate import mask_targets
from llmseg_tpu.data.prompts import (DEFAULT_IM_END_TOKEN,
                                     DEFAULT_IM_START_TOKEN,
                                     DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                     IMAGE_TOKEN_INDEX)
from llmseg_tpu.data.tokenizer import tokenizer_image_token

Source = List[Dict[str, str]]  # [{"from": "human"|"gpt", "value": str}, ...]


def preprocess_multimodal(sources: Sequence[Source], *,
                          mm_use_im_start_end: bool = False
                          ) -> List[Source]:
    """Normalize <image> placement (reference train.py:314-343): strip the
    token wherever it appears and re-prepend it as ``<image>\\n`` on that
    turn; optionally wrap with <im_start>/<im_end>."""
    out = copy.deepcopy(list(sources))
    for source in out:
        for sentence in source:
            if DEFAULT_IMAGE_TOKEN in sentence["value"]:
                v = sentence["value"].replace(DEFAULT_IMAGE_TOKEN, "").strip()
                sentence["value"] = (DEFAULT_IMAGE_TOKEN + "\n" + v).strip()
            if mm_use_im_start_end:
                sentence["value"] = sentence["value"].replace(
                    DEFAULT_IMAGE_TOKEN,
                    DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN
                    + DEFAULT_IM_END_TOKEN)
    return out


def preprocess_plain(sources: Sequence[Source], tokenizer
                     ) -> List[Tuple[List[int], np.ndarray]]:
    """Feature-alignment pretrain masking (reference train.py:592-620):
    conversation = "<image>" + caption + sep; every token up to and
    including the image placeholder is IGNORE, the caption supervises."""
    conv = conv_lib.conv_templates["plain"]
    results = []
    for source in sources:
        assert len(source) == 2, "plain preprocessing expects (image, caption)"
        assert DEFAULT_IMAGE_TOKEN in source[0]["value"]
        prompt = DEFAULT_IMAGE_TOKEN + source[1]["value"] + conv.sep
        ids = tokenizer_image_token(prompt, tokenizer)
        labels = np.asarray(ids, np.int64).copy()
        prefix_len = len(tokenizer_image_token(DEFAULT_IMAGE_TOKEN, tokenizer))
        labels[:prefix_len] = IGNORE_INDEX
        results.append((ids, labels))
    return results


def build_conversation(source: Source, conv_type: str = "vicuna_v1") -> str:
    """Render one source through the conversation template (reference
    train.py:436-452): drop a leading non-human turn, then alternate roles."""
    conv = conv_lib.get_default_conv_template(conv_type)
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    if roles.get(source[0]["from"]) != conv.roles[0]:
        source = source[1:]
    for j, sentence in enumerate(source):
        role = roles[sentence["from"]]
        assert role == conv.roles[j % 2], f"role order broken at turn {j}"
        conv.append_message(role, sentence["value"])
    return conv.get_prompt()


def preprocess_v1(sources: Sequence[Source], tokenizer, *,
                  conv_type: str = "vicuna_v1"
                  ) -> List[Tuple[List[int], np.ndarray]]:
    """Vicuna-style instruction masking (reference train.py:430-515).
    Reuses data/collate.mask_targets — byte-identical round arithmetic."""
    results = []
    for source in sources:
        conversation = build_conversation(source, conv_type)
        ids = tokenizer_image_token(conversation, tokenizer)
        labels = mask_targets(conversation, ids, tokenizer, conv_type)
        results.append((ids, labels))
    return results


def preprocess(sources: Sequence[Source], tokenizer, *,
               conv_type: str = "vicuna_v1"
               ) -> List[Tuple[List[int], np.ndarray]]:
    """Dispatch on template style (reference train.py:621-637)."""
    conv = conv_lib.conv_templates[conv_type]
    if conv.sep_style == conv_lib.SeparatorStyle.PLAIN:
        return preprocess_plain(sources, tokenizer)
    return preprocess_v1(sources, tokenizer, conv_type=conv_type)


def expand2square(image: np.ndarray, background: Tuple[int, int, int]
                  ) -> np.ndarray:
    """Pad an (H, W, 3) uint8 image to square, centering the short axis
    (reference train.py:712-728, aspect_ratio == "pad")."""
    h, w = image.shape[:2]
    if h == w:
        return image
    side = max(h, w)
    out = np.empty((side, side, 3), image.dtype)
    out[:] = np.asarray(background, image.dtype)
    if w > h:
        top = (side - h) // 2
        out[top:top + h, :] = image
    else:
        left = (side - w) // 2
        out[:, left:left + w] = image
    return out


_CLIP_MEAN_U8 = tuple(int(x * 255) for x in
                      np.asarray(image_ops.CLIP_MEAN).reshape(-1))


class SFTDataset:
    """LazySupervisedDataset equivalent (reference train.py:681-762).

    ``data_path`` is a json list of {"id", "image"?, "conversations"}.
    Multimodal samples are normalized via preprocess_multimodal; text-only
    samples in a multimodal run carry a zero CLIP image + has_image=False.
    """

    def __init__(self, data_path: str, tokenizer, *,
                 image_folder: Optional[str] = None,
                 conv_type: str = "vicuna_v1",
                 image_aspect_ratio: str = "pad",
                 clip_size: int = 224,
                 mm_use_im_start_end: bool = False,
                 is_multimodal: bool = True):
        with open(data_path) as f:
            self.items = json.load(f)
        self.tokenizer = tokenizer
        self.image_folder = image_folder
        self.conv_type = conv_type
        self.image_aspect_ratio = image_aspect_ratio
        self.clip_size = clip_size
        self.mm_use_im_start_end = mm_use_im_start_end
        self.is_multimodal = is_multimodal

    def __len__(self) -> int:
        return len(self.items)

    def _load_image(self, fname: str) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.image_folder or "", fname)
        img = np.asarray(Image.open(path).convert("RGB"))
        if self.image_aspect_ratio == "pad":
            img = expand2square(img, _CLIP_MEAN_U8)
        return image_ops.preprocess_clip(img, self.clip_size)

    def __getitem__(self, i: int) -> Dict:
        item = self.items[i]
        has_image = "image" in item
        source = item["conversations"]
        if has_image:
            (source,) = preprocess_multimodal(
                [source], mm_use_im_start_end=self.mm_use_im_start_end)
            image = self._load_image(item["image"])
        else:
            image = np.zeros((self.clip_size, self.clip_size, 3), np.float32)
        ((ids, labels),) = preprocess([source], self.tokenizer,
                                      conv_type=self.conv_type)
        return {"input_ids": ids, "labels": labels, "image": image,
                "has_image": has_image and self.is_multimodal}


def sft_collate(instances: Sequence[Dict], tokenizer, *,
                num_image_tokens: int,
                model_max_length: Optional[int] = None) -> Dict:
    """Static-shape batch for llava.forward + causal_lm_loss.

    Returns images_clip (B,H,W,3), input_ids (B,T) with the placeholder
    consumed, labels (B,T), image_pos (B,), has_image (B,) — T chosen so
    the spliced sequence is exactly model_max_length.
    """
    mml = model_max_length or tokenizer.model_max_length
    T = mml - (num_image_tokens - 1)
    B = len(instances)
    pad_id = tokenizer.pad_token_id

    input_ids = np.full((B, T), pad_id, np.int32)
    labels = np.full((B, T), IGNORE_INDEX, np.int64)
    image_pos = np.zeros((B,), np.int32)
    has_image = np.zeros((B,), bool)
    images = np.stack([inst["image"] for inst in instances])

    for b, inst in enumerate(instances):
        ids = np.asarray(inst["input_ids"], np.int64)[:T]
        tgt = np.asarray(inst["labels"], np.int64)[:T].copy()
        img_where = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
        if len(img_where) and inst["has_image"]:
            pos = int(img_where[0])
            has_image[b] = True
        else:
            # text-only: point the splice at the padded tail so the
            # (zeroed) image tokens land where causal attention cannot
            # reach any real token.  A row that fills the whole window is
            # truncated to T-1 so the first genuine pad slot exists.
            ids = ids[:T - 1]
            tgt = tgt[:T - 1]
            pos = len(ids)
        ids = ids.copy()
        ids[ids == IMAGE_TOKEN_INDEX] = pad_id
        tgt[tgt == IMAGE_TOKEN_INDEX] = IGNORE_INDEX
        n = len(ids)
        input_ids[b, :n] = ids
        labels[b, :n] = tgt
        image_pos[b] = pos

    return {"images_clip": images, "input_ids": input_ids, "labels": labels,
            "image_pos": image_pos, "has_image": has_image}
