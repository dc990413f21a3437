"""Pretrain/finetune task: multi-dataset concat with seeded shuffle.

Parity: `/root/reference/tasks/image_text_pretrain.py:11-58` — all
configured datasets merge into one ConcatDatasetWithShuffle
(shuffle seed 42, portion 1 hardcoded, `:40-41`).
"""

from __future__ import annotations

from ullava_tpu.data.datasets import ConcatDatasetWithShuffle
from ullava_tpu.registry import registry
from ullava_tpu.tasks.base_task import BaseTask


@registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    def build_datasets(self, dataset_cfg, tokenizer, processor_cfg=None,
                       conv_type: str = "conv_simple"):
        datasets = super().build_datasets(
            dataset_cfg, tokenizer, processor_cfg, conv_type
        )
        return ConcatDatasetWithShuffle(list(datasets.values()), seed=42, portion=1)
