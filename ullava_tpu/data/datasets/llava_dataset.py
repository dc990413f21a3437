"""LLaVA-style VQA/captioning datasets.

Parity: `/root/reference/dataset/datasets/llava_dataset.py:27-145` —
10-retry random-resample loop on corrupt images; `LLaVASegDataset` emits
VQA rows shaped like grounding rows (empty masks/boxes) so they mix into
stage-2 batches.
"""

from __future__ import annotations

import copy
import os
import random

import numpy as np
from PIL import Image

from ullava_tpu.data.datasets.base_dataset import BaseDataset
from ullava_tpu.tokenization import preprocess, preprocess_image_text


class LLaVADataset(BaseDataset):
    def __init__(self, vis_processor, tokenizer, vis_root, ann_root,
                 portion=1, image_token_len=256, data_type="image",
                 conv_type="conv_simple", seed=42):
        super().__init__(
            vis_processor=vis_processor, tokenizer=tokenizer, vis_root=vis_root,
            ann_root=ann_root, portion=portion, data_type=data_type,
            conv_type=conv_type, seed=seed,
        )
        self.image_token_len = image_token_len

    def __getitem__(self, index):
        num_retries = 10
        for _ in range(num_retries):
            try:
                sample = self.annotation[index]
                conversation_list = sample["conversations"]

                if "image" in sample:
                    image_path = os.path.join(self.vis_root, sample["image"])
                    image = np.asarray(Image.open(image_path).convert("RGB"))
                    image = self.prepare_clip_image(image)
                    sources = preprocess_image_text(
                        copy.deepcopy(conversation_list), self.image_token_len
                    )
                else:
                    image = None
                    sources = [copy.deepcopy(conversation_list)]

                data = preprocess(sources, self.tokenizer, self.conv_type)
                out = {"input_ids": data["input_ids"][0], "labels": data["labels"][0]}
                if image is not None:
                    out["image"] = image
                return out
            except Exception as error:  # corrupt sample -> resample
                name = sample.get("image", str(index)) if isinstance(sample, dict) else str(index)
                print(f"Failed to load example {name}, Error: {error}. Resampling.")
                index = random.randint(0, len(self) - 1)
        raise RuntimeError(f"Failed to fetch sample after {num_retries} retries.")


class LLaVASegDataset(LLaVADataset):
    """VQA rows inside stage-2 grounding batches: dummy SAM image, zero
    masks/boxes with all-invalid validity (the fixed-shape analogue of the
    reference's empty `rand(0, H, W)` tensors, `llava_dataset.py:101-145`)."""

    def __init__(self, *args, sam_size=1024, **kw):
        super().__init__(*args, **kw)
        self.sam_size = sam_size

    def __getitem__(self, index):
        out = super().__getitem__(index)
        out["image_sam"] = np.zeros((self.sam_size, self.sam_size, 3), np.float32)
        out["seg_mask"] = np.zeros((0, 1, 1), np.float32)  # no masks
        out["boxes"] = np.zeros((0, 4), np.float32)  # no boxes
        out["raw_size"] = (self.sam_size, self.sam_size)
        out["resize"] = (self.sam_size, self.sam_size)
        return out
