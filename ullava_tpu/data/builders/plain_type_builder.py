"""Plain builders: datasets configured by anno/image dirs only.

Registered names match the reference vocabulary
(`/root/reference/dataset/builders/plain_type_builder.py:23-67`):
llava_cc3m / llava_instruct / sqa -> LLaVADataset, llava_seg ->
LLaVASegDataset, tgif -> TgifDataset.
"""

from __future__ import annotations

from ullava_tpu.data.builders.base_builder import BaseDatasetBuilder
from ullava_tpu.data.datasets import LLaVADataset, LLaVASegDataset, TgifDataset
from ullava_tpu.registry import registry


class PlainBuilder(BaseDatasetBuilder):
    dataset_cls = LLaVADataset


for _name in ("llava_cc3m", "llava_instruct", "sqa", "llava_v1_5_mix665k"):
    registry.register_builder(_name)(PlainBuilder)


@registry.register_builder("llava_seg")
class LLaVASegBuilder(PlainBuilder):
    dataset_cls = LLaVASegDataset


@registry.register_builder("tgif")
class TgifBuilder(PlainBuilder):
    dataset_cls = TgifDataset
