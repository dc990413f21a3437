"""Trace the LLM serving phase (CLIP + prefill + decode) in isolation.

Round-5 attribution tool (VERDICT r4 item 4 follow-up): the bench's
measured split puts B=48 prefill at 1.52x its floor (0.786 vs 0.516 s)
and decode at 1.41x (0.595 vs 0.423 s). This captures jax.profiler
traces of (a) the max_new_tokens=1 program — CLIP + prefill + one decode
step — and (b) the full 32-token generate, so `tools/trace_summary.py`
can attribute each phase's above-floor time to ops.

Usage:
  BENCH_BATCH=48 python tools/llm_trace.py [--logdir profiles/llm48]
  [--mode prefill|full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="./profiles/llm_trace")
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument("--mode", default="prefill",
                        choices=["prefill", "full"])
    parser.add_argument("--max-new", type=int, default=32)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from ullava_tpu.models import generate as gen_mod
    from ullava_tpu.models.generate import GenerateConfig

    B = int(os.environ.get("BENCH_BATCH", "48"))
    cfg, params = bench.build_res(B)
    rng = np.random.default_rng(0)
    P = cfg.core.vision.num_patches
    prompt_len = P + 64
    ids = rng.integers(5, 1000, size=(B, prompt_len)).astype(np.int32)
    ids[:, 1] = cfg.core.img_start_id
    ids[:, 2 : 2 + P] = 3
    ids[:, 2 + P] = cfg.core.img_end_id
    b = dict(
        input_ids=jnp.asarray(ids),
        prompt_lens=jnp.full((B,), prompt_len, jnp.int32),
        images=jnp.asarray(
            rng.standard_normal((B, 224, 224, 3)).astype(np.float32)
        ),
    )
    mnt = 1 if args.mode == "prefill" else args.max_new
    gen = GenerateConfig(max_new_tokens=mnt, temperature=0.0)

    @jax.jit
    def serve(p, b):
        out = gen_mod.generate(
            p["core"], cfg.core, gen,
            input_ids=b["input_ids"], prompt_lens=b["prompt_lens"],
            images=b["images"],
        )
        return out["sequences"], out["lengths"]

    out = serve(params, b)
    bench._fence(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = serve(params, b)
    bench._fence(out)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"llm {args.mode} (mnt={mnt}): {dt:.4f} s/batch at B={B}")

    from ullava_tpu.utils.profiling import trace

    with trace(args.logdir):
        out = serve(params, b)
        bench._fence(out)
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()
