"""Standalone SAM ViT-H encode timing at serving batch (default 48).

Builds the zero-filled int8-quantized encoder exactly as `bench.build_res`
does (BENCH_W8A8 / BENCH_ATTN_A8 / BENCH_PACKED knobs honored), jits
`image_encoder.encode`, and prints per-batch / per-image times. Pass
--trace DIR to capture a jax.profiler trace of the steady-state steps.

Usage:
  python tools/microbench/sam_encode.py [-b 48] [-n 3] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", "--batch", type=int, default=48)
    ap.add_argument("-n", "--steps", type=int, default=3)
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from ullava_tpu.models.sam import image_encoder

    cfg, params = bench.build_res(args.batch)
    enc_params = params["sam"]["image_encoder"]
    vcfg = cfg.sam.vision

    @jax.jit
    def encode(p, x):
        return image_encoder.encode(p, vcfg, x)

    x = jnp.zeros((args.batch, vcfg.img_size, vcfg.img_size, 3), jnp.bfloat16)
    t0 = time.perf_counter()
    out = encode(enc_params, x)
    bench._fence(out)
    print(f"compile+first: {time.perf_counter() - t0:.2f}s", flush=True)

    def run(steps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = encode(enc_params, x)
        bench._fence(out)
        return (time.perf_counter() - t0) / steps

    run(1)  # warm
    if args.trace:
        with jax.profiler.trace(args.trace):
            dt = run(args.steps)
    else:
        dt = run(args.steps)
    print(
        f"encode: {dt * 1e3:.1f} ms/batch  {dt / args.batch * 1e3:.2f} ms/img"
        f"  ({args.batch / dt:.2f} img/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
