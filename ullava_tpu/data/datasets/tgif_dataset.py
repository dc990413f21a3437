"""TGIF video/GIF captioning-QA dataset.

Parity: `/root/reference/dataset/datasets/tgif_dataset.py:20-88` — GIF
load via the processor, `image_token_len = n_frm + 256` token accounting,
10-retry resample loop.
"""

from __future__ import annotations

import copy
import os
import random

from ullava_tpu.data.datasets.base_dataset import BaseDataset
from ullava_tpu.tokenization import preprocess, preprocess_video_text


class TgifDataset(BaseDataset):
    def __init__(self, vis_processor, tokenizer, vis_root, ann_root,
                 portion=1, image_token_len=256, data_type="video",
                 conv_type="conv_simple", seed=42):
        super().__init__(
            vis_processor=vis_processor, tokenizer=tokenizer, vis_root=vis_root,
            ann_root=ann_root, portion=portion, data_type=data_type,
            conv_type=conv_type, seed=seed,
        )
        self.resize_size = vis_processor.image_size
        self.num_frm = vis_processor.n_frm
        # temporal tokens (n_frm) + spatial tokens (num_patches)
        self.image_token_len = self.num_frm + image_token_len

    def __getitem__(self, index):
        num_retries = 10
        for _ in range(num_retries):
            try:
                sample = self.annotation[index]
                conversation_list = sample["conversations"]
                if "gif" in sample:
                    gif_path = os.path.join(self.vis_root, sample["gif"])
                    video = self.vis_processor(gif_path)
                    sources = preprocess_video_text(
                        copy.deepcopy(conversation_list), self.image_token_len
                    )
                else:
                    video = None
                    sources = [copy.deepcopy(conversation_list)]

                data = preprocess(sources, self.tokenizer, self.conv_type)
                out = {"input_ids": data["input_ids"][0], "labels": data["labels"][0]}
                if video is not None:
                    out["video"] = video
                return out
            except Exception as error:
                name = sample.get("gif", str(index)) if isinstance(sample, dict) else str(index)
                print(f"Failed to load video {name}: {error}. Resampling.")
                index = random.randint(0, len(self) - 1)
        raise RuntimeError(f"Failed to fetch video after {num_retries} retries.")
