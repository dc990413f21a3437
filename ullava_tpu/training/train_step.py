"""Sharded train steps (stage 1 and stage 2) over a device mesh.

The jit-partitioned step subsumes the reference's distribution stack
(SURVEY.md §2.10): gradient all-reduce (torchrun DDP), optimizer-state
sharding (DeepSpeed ZeRO-2), and tensor parallelism all come from
parameter/batch shardings — XLA inserts the collectives over ICI.

Freeze policy = tree partition: gradients are taken wrt the trainable
subtree only, so the frozen 7B/ViT towers never allocate gradient or
Adam-moment buffers (the jit analogue of requires_grad=False + ZeRO
memory savings).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ullava_tpu.models import ullava, ullava_core
from ullava_tpu.parallel.sharding import param_shardings
from ullava_tpu.training.optim import merge_params, partition_params, trainable_labels


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any  # full model params
    opt_state: Any  # optimizer state over the trainable subtree only


def make_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    trainable_patterns: Sequence[str],
) -> Tuple[TrainState, Any]:
    """Returns (state, labels). opt_state covers only trainable leaves."""
    labels = trainable_labels(params, trainable_patterns)
    train_p, _ = partition_params(params, labels)
    return (
        TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(train_p)),
        labels,
    )


def shard_train_state(
    state: TrainState,
    mesh: Mesh,
    tx: optax.GradientTransformation,
    labels: Any,
) -> TrainState:
    """Place params per partition rules; optimizer moments inherit their
    param's sharding by TREE POSITION: `optax.tree_map_params` walks the
    param-tree copies embedded in the optimizer state (Adam mu/nu mirror
    the trainable subtree), so two same-shaped params with different
    specs can never collide. Non-param state (step counts) replicates."""
    p_shard = param_shardings(state.params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, state.params, p_shard)
    train_specs, _ = partition_params(p_shard, labels)
    repl = NamedSharding(mesh, P())
    opt_state = optax.tree_map_params(
        tx,
        lambda leaf, spec: jax.device_put(leaf, spec),
        state.opt_state,
        train_specs,
        transform_non_params=lambda leaf: jax.device_put(leaf, repl),
    )
    step = jax.device_put(state.step, repl)
    return TrainState(step=step, params=params, opt_state=opt_state)


def _make_step(loss_fn: Callable, tx, labels) -> Callable:
    """Generic step: partition -> grad over trainable -> update -> merge."""

    def step(state: TrainState, batch: Dict[str, Any]):
        train_p, frozen_p = partition_params(state.params, labels)

        def inner(tp):
            return loss_fn(merge_params(tp, frozen_p), batch)

        (loss, aux), grads = jax.value_and_grad(inner, has_aux=True)(train_p)
        updates, new_opt = tx.update(grads, state.opt_state, train_p)
        new_train = optax.apply_updates(train_p, updates)
        new_params = merge_params(new_train, frozen_p)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return step


def make_stage1_step(
    cfg: ullava_core.UllavaCoreConfig, tx, labels
) -> Callable:
    """Batch keys: input_ids, labels, attn_lens, optionally images/videos
    (presence is static per compiled variant; the loader groups batches
    by modality)."""

    def loss_fn(params, batch):
        # Stage-1 params live under a 'core' key so freeze-policy regexes
        # are shared between stages.
        out = ullava_core.forward(
            params["core"], cfg,
            input_ids=batch["input_ids"],
            labels=batch["labels"],
            attn_lens=batch.get("attn_lens"),
            images=batch.get("images"),
            videos=batch.get("videos"),
        )
        return out["loss"], {}

    return _make_step(loss_fn, tx, labels)


_STAGE2_KEYS = (
    "input_ids", "labels", "attn_lens", "images", "images_sam",
    "gt_masks", "mask_valid", "gt_boxes", "box_valid", "input_hw",
)


def make_stage2_step(cfg: ullava.UllavaConfig, tx, labels) -> Callable:
    def loss_fn(params, batch):
        model_batch = {k: batch[k] for k in _STAGE2_KEYS if k in batch}
        out = ullava.forward(params, cfg, **model_batch)
        aux = {
            "ce_loss": out["ce_loss"],
            "mask_bce_loss": out["mask_bce_loss"],
            "mask_dice_loss": out["mask_dice_loss"],
            "bbox_loss": out["bbox_loss"],
        }
        return out["loss"], aux

    return _make_step(loss_fn, tx, labels)


def jit_step(step_fn: Callable) -> Callable:
    """jit with state donation; shardings come from the committed
    placement of the inputs (`shard_train_state` /
    `parallel.sharding.shard_batch`) and propagate through the step."""
    return jax.jit(step_fn, donate_argnums=(0,))
