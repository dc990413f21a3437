"""Trace ONLY the SAM serving program (encode + mask decode) at B=BENCH_BATCH.

Round-5 attribution tool (VERDICT r4 item 3): captures a jax.profiler
trace of `serve_sam` alone — the bench's second jit program — so
`tools/trace_summary.py --by-shape` attributes the measured-over-floor
gap (2.564x at B=48 in BENCH_r04) without LLM ops mixed into the track.

Usage:
  BENCH_BATCH=48 python tools/sam_trace.py [--logdir profiles/sam48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="./profiles/sam_trace")
    parser.add_argument("--steps", type=int, default=2)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from ullava_tpu.models import ullava
    from ullava_tpu.models.sam import build as sam_build
    from ullava_tpu.utils.profiling import trace

    B = int(os.environ.get("BENCH_BATCH", "48"))
    cfg, params = bench.build_res(B)
    rng = np.random.default_rng(0)
    images_sam = jnp.asarray(
        rng.standard_normal((B, 1024, 1024, 3)).astype(np.float32)
    )
    seg0 = jnp.zeros((B, cfg.max_masks, 256), jnp.float32)

    @jax.jit
    def serve_sam(p, images_sam, seg_embeds):
        emb = ullava.get_visual_embs(p, cfg, images_sam)
        low, iou = sam_build.forward_masks(p["sam"], cfg.sam, emb, seg_embeds)
        return low

    out = serve_sam(params, images_sam, seg0)
    bench._fence(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = serve_sam(params, images_sam, seg0)
    bench._fence(out)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"sam phase: {dt:.4f} s/batch at B={B} ({B/dt:.2f} img/s)")

    with trace(args.logdir):
        out = serve_sam(params, images_sam, seg0)
        bench._fence(out)
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
