#!/usr/bin/env bash
# Stage-2 finetuning launcher (TPU equivalent of the reference's
# torchrun shells/finetune.sh). See pretrain.sh for multi-host notes.
set -euo pipefail
cd "$(dirname "$0")/.."

python train_ullava.py --cfg_path configs/train/ullava.yaml "$@"
