"""Micro-split of the SAM ViT-H encoder at the serving operating point.

Times patch embed, one window block, one global block, and the neck at
B=BENCH_BATCH (default 16) with int8 weights, then extrapolates the
28-window + 4-global stack and compares against the measured full
encode. Guides which component to fuse next.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5):
    import jax

    def fence(o):
        jax.block_until_ready(o)
        return float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])

    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from ullava_tpu.models import ullava
    from ullava_tpu.models.sam import image_encoder as ie

    B = int(os.environ.get("BENCH_BATCH", "16"))
    cfg, params = bench.build_res(B)
    vcfg = cfg.sam.vision
    enc = params["sam"]["image_encoder"]
    rng = np.random.default_rng(0)
    g, C = vcfg.grid, vcfg.embed_dim
    x = jnp.asarray(rng.standard_normal((B, g, g, C)).astype(np.float32)).astype(
        vcfg.dtype
    )
    images = jnp.asarray(
        rng.standard_normal((B, vcfg.img_size, vcfg.img_size, 3)).astype(np.float32)
    )

    # one window + one global block's params (group 0, slot 0)
    wb = jax.tree_util.tree_map(lambda a: a[0], enc["window_blocks"])
    gb = jax.tree_util.tree_map(lambda a: a[0], enc["global_blocks"])

    win = jax.jit(lambda p, h: ie._block(h, p, vcfg, window=True))
    glob = jax.jit(lambda p, h: ie._block(h, p, vcfg, window=False))
    full = jax.jit(lambda p, im: ie.encode(p, vcfg, im))

    t_win = timed(win, wb, x)
    t_glob = timed(glob, gb, x)
    t_full = timed(full, enc, images, iters=3)

    n_win = vcfg.num_groups * (vcfg.group_period - 1)
    n_glob = vcfg.num_groups
    extrap = n_win * t_win + n_glob * t_glob

    # matmul-only roofline for one block (qkv+proj+mlp), bf16
    tokens = B * g * g
    flops_block = 2 * tokens * (C * 3 * C + C * C + 2 * C * int(C * vcfg.mlp_ratio))
    print(json.dumps({
        "batch": B,
        "window_block_ms": round(t_win * 1e3, 3),
        "global_block_ms": round(t_glob * 1e3, 3),
        "block_matmul_roofline_ms": round(flops_block / bench.V5E_BF16_PEAK * 1e3, 3),
        "full_encode_s": round(t_full, 4),
        "blocks_extrapolated_s": round(extrap, 4),
        "patch_neck_overhead_s": round(t_full - extrap, 4),
        "n_window": n_win,
        "n_global": n_glob,
    }))


if __name__ == "__main__":
    main()
