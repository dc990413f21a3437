"""Microbench the SAM attention kernels at B=48 serving shapes.

Times fused_global_attention (4 layers' worth of work per serve) and
fused_window_attention_grid at the resident-layout shapes, to guide the
softmax VPU-cost work (fast exp2, MXU row-sum, deferred normalization).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(o):
    jax.block_until_ready(o)
    return float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])


def timed(fn, *args, iters=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ullava_tpu.ops import sam_attention as sa

    B = int(os.environ.get("MB_B", "48"))
    H, hd = 16, 80

    rng = np.random.default_rng(0)

    # --- global attention: S = 4096, grid side 64 ---
    S, W = 4096, 64
    N = B * H
    q = jnp.asarray(rng.standard_normal((N, S, hd)).astype(np.float32) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((N, S, hd)).astype(np.float32) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((N, S, hd)).astype(np.float32) * 0.3, jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((N, S, W)).astype(np.float32) * 0.1, jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal((N, S, W)).astype(np.float32) * 0.1, jnp.bfloat16)

    glob = jax.jit(
        lambda *x: sa.fused_global_attention(*x, window=W, scale=hd**-0.5)
    )
    t = timed(glob, q, k, v, a, bb)
    print(f"global S=4096 N={N}: {t*1000:.2f} ms  (x4 layers = {4*t*1000:.1f} ms/serve)")

    # --- window attention (grid-native): 16 windows/img of 196 tokens ---
    Sw, Ww = 196, 14
    Nw = B * 16
    C = H * hd
    y = jnp.asarray(rng.standard_normal((Nw, Sw, 3 * C)).astype(np.float32) * 0.3, jnp.bfloat16)
    aw = jnp.asarray(rng.standard_normal((Nw, Sw, H * Ww)).astype(np.float32) * 0.1, jnp.bfloat16)
    bw = jnp.asarray(rng.standard_normal((Nw, Sw, H * Ww)).astype(np.float32) * 0.1, jnp.bfloat16)

    win = jax.jit(
        lambda *x: sa.fused_window_attention_grid(
            *x, num_heads=H, head_dim=hd, window=Ww, scale=hd**-0.5
        )
    )
    t = timed(win, y, aw, bw)
    if os.environ.get("MB_VARIANTS", "0") == "1":
        # Round-5 block-size sweep: global q-tile height (k/v re-read
        # traffic scales with S/block_q) and grid windows-per-program.
        Sg, Wg = 4096, 64
        yg = jnp.asarray(
            rng.standard_normal((B, Sg, 3 * C)).astype(np.float32) * 0.3,
            jnp.bfloat16,
        )
        ag = jnp.asarray(
            rng.standard_normal((B, Sg, H, Wg)).astype(np.float32) * 0.1,
            jnp.bfloat16,
        )
        bg = jnp.asarray(
            rng.standard_normal((B, Sg, H, Wg)).astype(np.float32) * 0.1,
            jnp.bfloat16,
        )
        for bq in (1024, 2048, 4096):
            fy = jax.jit(functools.partial(
                sa.fused_global_attention_y, num_heads=H, head_dim=hd,
                window=Wg, scale=hd**-0.5, block_q=bq, exp_bf16=True,
            ))
            try:
                t = timed(fy, yg, ag, bg)
                print(f"global_y bq={bq}: {t*1000:.2f} ms/layer "
                      f"(x4 = {4*t*1000:.1f} ms/serve)")
            except Exception as e:
                print(f"global_y bq={bq}: FAILED {type(e).__name__}")
        for nb in (4, 8, 16):
            fw = jax.jit(functools.partial(
                sa.fused_window_attention_grid, num_heads=H, head_dim=hd,
                window=Ww, scale=hd**-0.5, n_block=nb,
            ))
            try:
                t = timed(fw, y, aw, bw)
                print(f"grid nb={nb}: {t*1000:.2f} ms/layer "
                      f"(x28 = {28*t*1000:.1f} ms/serve, full class)")
            except Exception as e:
                print(f"grid nb={nb}: FAILED {type(e).__name__}")
    # NOTE: full-window class ONLY (16 of the ~21 window-equivalents per
    # image, ~77% of tokens); the right/bottom/corner edge classes run the
    # rect kernel and are not benched here, so the x28 extrapolation
    # UNDERSTATES total per-serve window-attention cost by ~23%.
    print(
        f"window grid S=196 N={Nw}: {t*1000:.2f} ms  "
        f"(x28 layers = {28*t*1000:.1f} ms/serve, full-window class only "
        "— excludes right/bottom/corner edge windows)"
    )


if __name__ == "__main__":
    main()
