"""Base processor: identity transform + from_config
(parity: `/root/reference/dataset/processors/base_processor.py:9-33`)."""

from __future__ import annotations

from ullava_tpu.registry import registry


class BaseProcessor:
    def __init__(self):
        self.transform = lambda x: x

    def __call__(self, item):
        return self.transform(item)

    @classmethod
    def from_config(cls, cfg=None):
        return cls()


registry.register_processor("base_processor")(BaseProcessor)
