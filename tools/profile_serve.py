"""Capture a jax.profiler trace of the serving pipeline on TPU.

Usage:
  python tools/profile_serve.py [--logdir ./profiles] [--batch 8]

Writes an XProf/TensorBoard trace of one RES serving batch (SAM encode,
CLIP+prefill, decode, mask decode) for kernel-level optimization between
rounds. Uses the bench harness's zero-filled reference-scale model.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="./profiles")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--preset", default="res", choices=["res", "7b", "stage2"])
    args = parser.parse_args()

    import jax

    import bench
    from ullava_tpu.utils.profiling import trace

    if args.preset == "res":
        run = lambda: bench.run_res(args.batch, steps=1)
    elif args.preset == "stage2":
        run = lambda: bench.run_stage2(args.batch, steps=1)
    else:
        run = lambda: bench.run(args.preset, args.batch, seq=384, steps=1)

    run()  # compile outside the trace
    with trace(args.logdir):
        run()
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
