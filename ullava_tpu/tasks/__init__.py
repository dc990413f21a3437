"""Task layer: registry dispatch on config `task.type`
(parity: `/root/reference/tasks/__init__.py:27-31`)."""

import ullava_tpu.data  # noqa: F401  (registers processors/builders/collators)
from ullava_tpu.registry import registry
from ullava_tpu.tasks.base_task import BaseTask  # noqa: F401
from ullava_tpu.tasks.image_text_pretrain import ImageTextPretrainTask  # noqa: F401
from ullava_tpu.tasks.image_text_evaluate import ImageTextEvaluateTask  # noqa: F401


def setup_task(task_cfg):
    cls = registry.get_task_class(task_cfg.get("type"))
    if cls is None:
        raise KeyError(f"task '{task_cfg.get('type')}' is not registered")
    return cls(task_cfg)
