"""Measure the RES serving phase split on the real chip.

Times, at the bench's reference-scale int8 operating point:
  - SAM ViT-H encode alone,
  - prefill (+1 decode step) via max_new_tokens=1,
  - the full 32-token generation (isolates per-decode-step cost),
  - SAM mask decode (serve_sam minus encode).
Prints one JSON line; drives round-to-round optimization priorities.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    import jax

    def fence(o):
        # block_until_ready is not a reliable fence through the TPU
        # tunnel; a host scalar fetch is.
        jax.block_until_ready(o)
        return float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])

    fence(fn(*args))  # warmup + compile, fully drained
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
    from ullava_tpu.models import generate as gen_mod
    from ullava_tpu.models import ullava
    from ullava_tpu.models.generate import GenerateConfig

    B = int(os.environ.get("BENCH_BATCH", "16"))
    cfg, params = bench.build_res(B)
    rng = np.random.default_rng(0)
    P = cfg.core.vision.num_patches
    prompt_len = P + 64
    ids = rng.integers(5, 1000, size=(B, prompt_len)).astype(np.int32)
    ids[:, 1] = cfg.core.img_start_id
    ids[:, 2 : 2 + P] = 3
    ids[:, 2 + P] = cfg.core.img_end_id
    input_ids = jnp.asarray(ids)
    prompt_lens = jnp.full((B,), prompt_len, jnp.int32)
    images = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    images_sam = jnp.asarray(
        rng.standard_normal((B, 1024, 1024, 3)).astype(np.float32)
    )

    sam_encode = jax.jit(lambda p, x: ullava.get_visual_embs(p, cfg, x))
    t_sam_encode = timed(sam_encode, params, images_sam)

    def mk_gen(n):
        g = GenerateConfig(max_new_tokens=n, temperature=0.0)

        @jax.jit
        def f(p, ids_, lens_, im):
            out = gen_mod.generate(
                p["core"], cfg.core, g,
                input_ids=ids_, prompt_lens=lens_, images=im,
            )
            return out["lengths"], out["hidden_last"]

        return f

    g1 = mk_gen(1)
    g32 = mk_gen(32)
    t_prefill1 = timed(g1, params, input_ids, prompt_lens, images)
    t_gen32 = timed(g32, params, input_ids, prompt_lens, images)
    per_step = (t_gen32 - t_prefill1) / 31

    emb = sam_encode(params, images_sam)
    seg = jnp.zeros((B, cfg.max_masks, 256), jnp.float32)
    from ullava_tpu.models.sam import build as sam_build

    mask_dec = jax.jit(
        lambda p, e, s: sam_build.forward_masks(p["sam"], cfg.sam, e, s)[0]
    )
    t_mask_decode = timed(mask_dec, params, emb, seg)

    total = t_sam_encode + t_gen32 + t_mask_decode
    print(json.dumps({
        "batch": B,
        "sam_encode_s": round(t_sam_encode, 4),
        "prefill_plus1_s": round(t_prefill1, 4),
        "gen32_s": round(t_gen32, 4),
        "decode_ms_per_step": round(per_step * 1e3, 3),
        "mask_decode_s": round(t_mask_decode, 4),
        "approx_total_s": round(total, 4),
        "approx_img_per_s": round(B / total, 3),
        "split_pct": {
            "sam_encode": round(100 * t_sam_encode / total, 1),
            "prefill": round(100 * t_prefill1 / total, 1),
            "decode": round(100 * (t_gen32 - t_prefill1) / total, 1),
            "mask_decode": round(100 * t_mask_decode / total, 1),
        },
    }))


if __name__ == "__main__":
    main()
