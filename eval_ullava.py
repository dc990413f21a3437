"""Batch evaluation entry point: cIoU / gIoU / Prec@0.5 over eval sets.

Usage (reference-compatible, `/root/reference/evaluation/eval_ullava.py`):
    python eval_ullava.py --cfg_path configs/eval/eval_all.yaml

Per eval dataset: teacher-forced stage-2 forward, exact host-side mask
postprocess to original resolutions, cumulative cIoU + mean gIoU + box
Prec@0.5, results logged to per-dataset files under `training.output_dir`.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
logger = logging.getLogger("eval_ullava")


def evaluate(cfg, tokenizer=None, max_samples=None):
    from ullava_tpu.models import build as model_build
    from ullava_tpu.evaluation.harness import make_teacher_forced_eval_fn

    model_cfg, _, eval_dataset_cfg, training_cfg, _, processor_cfg = cfg.assign_config()
    model_max_length = int(training_cfg.get("model_max_length", 512))
    if tokenizer is None:
        tokenizer = model_build.build_tokenizer(model_cfg.get("llm_path"), model_max_length)

    u_cfg, params = model_build.build_ullava(model_cfg, tokenizer)
    conv_type = model_cfg.get("conv_type", "conv_sep2")

    eval_fn = make_teacher_forced_eval_fn(
        u_cfg, eval_dataset_cfg, tokenizer, processor_cfg, conv_type,
        model_max_length=model_max_length, max_samples=max_samples,
    )
    results = eval_fn(params)

    out_dir = training_cfg.get("output_dir", "./eval_out")
    os.makedirs(out_dir, exist_ok=True)
    for name, metrics in results.items():
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        logger.info("%s: %s", name, metrics)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", required=True)
    parser.add_argument("--max_samples", type=int, default=None)
    args = parser.parse_args()

    from ullava_tpu.config import Config
    import ullava_tpu.models.build  # noqa: F401

    evaluate(Config(args.cfg_path), max_samples=args.max_samples)
