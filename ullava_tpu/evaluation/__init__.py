"""Evaluation layer: metrics, meters, and the batch eval harness."""

from ullava_tpu.evaluation.tools import (  # noqa: F401
    AverageMeter,
    Summary,
    bbox_iou,
    intersection_and_union,
)
