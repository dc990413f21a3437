"""Optimizer construction: AdamW + freeze policies + LR schedules.

Freeze policies mirror the reference's requires_grad surgery:
- stage-1 pretrain: train ONLY vision projector + input embeddings
  (`/root/reference/train_ullava_core.py:145-156`);
- stage-1 finetune (projector_from_scratch=False): train LLM + projector,
  CLIP frozen;
- stage-2: train lm_head/embed_tokens/decoder layers (or LoRA),
  seg/det projectors, SAM mask decoder (minus iou_prediction_head,
  reference `train_ullava.py:248-261`), det decoder; CLIP tower, vision
  projector, SAM encoder + prompt encoder frozen
  (`train_ullava.py:207-261`).

Implemented by partitioning the param tree on path-pattern labels:
gradients and Adam moments exist only for the trainable subtree (the
memory win the reference gets from ZeRO offload falls out for free).
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
import optax

# (stage, list of trainable-path regexes)
STAGE1_PRETRAIN = (
    r"^core/projector/",
    r"^core/llm/embed_tokens$",
)
STAGE1_FINETUNE = (
    r"^core/llm/",
    r"^core/projector/",
)
STAGE2 = (
    r"^core/llm/",
    r"^seg_projector/",
    r"^det_projector/",
    r"^det_decoder/",
    r"^sam/mask_decoder/(?!iou_head)",  # iou head frozen (reference quirk)
)
STAGE2_LORA = (
    r"^core/llm/layers/(q|v)_lora_(a|b)$",
    r"^core/llm/embed_tokens$",
    r"^core/llm/lm_head$",
    r"^seg_projector/",
    r"^det_projector/",
    r"^det_decoder/",
    r"^sam/mask_decoder/(?!iou_head)",
)

# Paths relative to a bare stage-1 param tree (no 'core/' prefix).
STAGE1_PRETRAIN_BARE = (r"^projector/", r"^llm/embed_tokens$")
STAGE1_FINETUNE_BARE = (r"^llm/", r"^projector/")


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def trainable_labels(params: Any, patterns: Sequence[str]) -> Any:
    """'train' / 'freeze' label tree for optax.multi_transform."""
    regs = [re.compile(p) for p in patterns]

    def label(path, _leaf):
        s = _path_str(path)
        return "train" if any(r.search(s) for r in regs) else "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def partition_params(params: Any, labels: Any) -> Tuple[Any, Any]:
    """Split params into (trainable, frozen) trees with None placeholders.

    Gradients are then taken wrt the trainable tree only — the frozen 7B/
    ViT towers never materialize gradient buffers (the jit-level analogue
    of requires_grad=False)."""
    train = jax.tree_util.tree_map(
        lambda l, lab: l if lab == "train" else None, params, labels,
        is_leaf=lambda x: x is None,
    )
    frozen = jax.tree_util.tree_map(
        lambda l, lab: l if lab == "freeze" else None, params, labels,
        is_leaf=lambda x: x is None,
    )
    return train, frozen


def merge_params(train: Any, frozen: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b, train, frozen,
        is_leaf=lambda x: x is None,
    )


def make_lr_schedule(
    learning_rate: float,
    total_steps: int,
    warmup_ratio: float = 0.03,
    schedule: str = "linear",
) -> optax.Schedule:
    """HF-Trainer-equivalent schedules (reference uses the HF default
    'linear' with warmup_ratio 0.03, `configs/train/*.yaml`)."""
    warmup = max(int(total_steps * warmup_ratio), 1)
    if schedule == "linear":
        decay = optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup, 1))
    elif schedule == "cosine":
        decay = optax.cosine_decay_schedule(learning_rate, max(total_steps - warmup, 1))
    elif schedule == "constant":
        decay = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown schedule {schedule}")
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, warmup), decay], [warmup]
    )


def make_optimizer(
    learning_rate,
    *,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW over the TRAINABLE subtree only (see `partition_params`):
    gradients and Adam moments are never materialized for frozen towers."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip else optax.identity(),
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
    )
