#!/usr/bin/env bash
# Batch evaluation over the 8 RefCOCO* splits.
set -euo pipefail
cd "$(dirname "$0")/.."

python eval_ullava.py --cfg_path configs/eval/eval_all.yaml "$@"
