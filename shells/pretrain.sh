#!/usr/bin/env bash
# Stage-1 pretraining launcher (TPU equivalent of the reference's
# torchrun shells/pretrain.sh). On a multi-host TPU slice run this same
# command on every host; jax.distributed picks up the topology from the
# TPU environment. Mesh axes come from configs (training.fsdp/tp); the
# data axis is inferred from the global device count.
set -euo pipefail
cd "$(dirname "$0")/.."

python train_ullava_core.py --cfg_path configs/train/ullava_core.yaml "$@"
