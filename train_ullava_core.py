"""Stage-1 pretraining/finetuning entry point.

Usage (reference-compatible CLI, `/root/reference/train_ullava_core.py`):
    python train_ullava_core.py --cfg_path configs/train/ullava_core.yaml

YAML -> Config -> tokenizer -> model from checkpoints -> task builds
processors/collator/datasets -> sharded jit train loop. Freezing policy:
pretrain (projector_from_scratch=true) trains only the vision projector +
input embeddings; finetune trains LLM + projector (CLIP always frozen).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("train_ullava_core")


def train(cfg, tokenizer=None):
    import jax

    from ullava_tpu.models import build as model_build
    from ullava_tpu.parallel import MeshConfig, make_mesh
    from ullava_tpu.tasks import setup_task
    from ullava_tpu.training import optim
    from ullava_tpu.training.train_step import (
        jit_step, make_stage1_step, make_train_state, shard_train_state,
    )
    from ullava_tpu.training.trainer import Trainer
    from ullava_tpu.data.loader import DataLoader

    model_cfg, dataset_cfg, _, training_cfg, task_cfg, processor_cfg = cfg.assign_config()

    model_max_length = int(training_cfg.get("model_max_length", 1024))
    if tokenizer is None:
        tokenizer = model_build.build_tokenizer(model_cfg.get("llm_path"), model_max_length)

    core_cfg, params = model_build.build_ullava_core(model_cfg, tokenizer)
    params = {"core": params}

    task = setup_task(task_cfg)
    conv_type = model_cfg.get("conv_type", "conv_simple")
    dataset = task.build_datasets(dataset_cfg, tokenizer, processor_cfg, conv_type)
    collator = task.build_collator(
        tokenizer.pad_token_id, model_max_length=model_max_length
    )

    mesh = make_mesh(MeshConfig(
        fsdp=int(training_cfg.get("fsdp", 1)), tp=int(training_cfg.get("tp", 1)),
    ))
    n_data = mesh.devices.shape[0] * mesh.devices.shape[1]
    batch_size = int(training_cfg.get("per_device_train_batch_size", 8)) * n_data

    loader = DataLoader(
        dataset, batch_size=batch_size, collate_fn=collator,
        num_workers=int(training_cfg.get("dataloader_num_workers", 8)),
        seed=int(training_cfg.get("seed", 42)),
    )

    epochs = int(training_cfg.get("num_train_epochs", 1))
    total_steps = max(len(loader) * epochs, 1)
    schedule = optim.make_lr_schedule(
        float(training_cfg.get("learning_rate", 2e-3)),
        total_steps,
        warmup_ratio=float(training_cfg.get("warmup_ratio", 0.03)),
        schedule=training_cfg.get("lr_scheduler_type", "linear"),
    )
    tx = optim.make_optimizer(
        schedule, weight_decay=float(training_cfg.get("weight_decay", 0.0))
    )
    patterns = (
        optim.STAGE1_PRETRAIN
        if core_cfg.projector_from_scratch
        else optim.STAGE1_FINETUNE
    )
    state, labels = make_train_state(params, tx, patterns)
    state = shard_train_state(state, mesh, tx, labels)
    step = jit_step(make_stage1_step(core_cfg, tx, labels))

    trainer = Trainer(
        state=state, step_fn=step, train_loader=loader, training_cfg=training_cfg,
        mesh=mesh, lr_schedule=schedule,
    )
    final_state = trainer.train(resume=True)
    logger.info("training complete at step %d", int(final_state.step))
    return final_state


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", required=True)
    parser.add_argument("--options", nargs="*", default=None, help="(reserved)")
    args = parser.parse_args()

    from ullava_tpu.config import Config
    import ullava_tpu.models.build  # noqa: F401  (registers archs)

    train(Config(args.cfg_path))
