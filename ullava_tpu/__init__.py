"""u-LLaVA-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multi-modal multi-task
LLM framework with the capabilities of OPPOMKLab/u-LLaVA.

Capabilities (reference `README.md:125-134`): image/video captioning, VQA,
referring-expression segmentation (RES), salient/semantic segmentation, and
referring-expression comprehension (REC) — built around a CLIP ViT-L/14
tower, a LLaMA/Vicuna-7B decoder, a SAM ViT-H mask decoder, and an MLP box
head, with `[SEG]`/`[LOC]` token routing.

This package is a ground-up TPU design: functional models over parameter
pytrees, one `jax.sharding.Mesh` threaded through train/serve, Pallas
kernels on the hot paths, fixed-shape host data pipeline, and orbax
checkpoints.
"""

__version__ = "0.1.0"

from ullava_tpu import constants  # noqa: F401
from ullava_tpu.config import Config, ConfigNode  # noqa: F401
from ullava_tpu.registry import registry  # noqa: F401
