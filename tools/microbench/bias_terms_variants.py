"""Microbench: window rel-pos bias-term production at B=48 ViT-H shapes.

The resident window path spends ~4.9 ms/layer producing the decomposed
bias terms A/Bb [N, T, H*W] for the attention kernels:
  current : P = q @ block-diag rel (2 bf16 matmuls, fusion.845/.846,
            ~1.09 ms each) + static slice-assembly concat
            (fusion.847/concatenate/reshape/layout copies, ~2.75 ms).
Variants:
  edot    : same P matmuls, then one i-batched (j-batched for Bb)
            selection dot against a [14, 432, 224] block-diag one-hot
            constant — replaces the slice-assembly.
  direct  : skip P; one i-batched dot of q against [14, 1280, 224]
            combined block-diag weights (the round-2 einsum failure mode,
            retried as an explicit dot_general).
All variants must agree bitwise-ish (bf16 dot reassociation) with current.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ullava_tpu.models.sam import image_encoder as ie


def fence(o):
    jax.block_until_ready(o)
    return float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0].astype(jnp.float32))

def timed(fn, *args, iters=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def selection_onehot(W: int, H: int, dtype):
    """[W(i), H*R, H*W] block-diag per head: E[i, (h,r), (h,a')] =
    1 iff r == i + a' (the reversed-column window band)."""
    R = 2 * W - 1
    E = np.zeros((W, H * R, H * W), np.float32)
    for i in range(W):
        for a in range(W):
            r = i + a
            for h in range(H):
                E[i, h * R + r, h * W + a] = 1.0
    return jnp.asarray(E, dtype)


def main():
    B = int(os.environ.get("MB_B", "48"))
    H, hd, W = 16, 80, 14
    C, R, T = H * hd, 2 * W - 1, W * W
    N = B * 16  # full-window class

    rng = np.random.default_rng(0)
    y = jnp.asarray(
        (0.3 * rng.standard_normal((N, T, 3 * C))).astype(np.float32),
        jnp.bfloat16,
    )
    rel_h = jnp.asarray(0.1 * rng.standard_normal((R, hd)), jnp.bfloat16)
    rel_w = jnp.asarray(0.1 * rng.standard_normal((R, hd)), jnp.bfloat16)

    cfg = ie.SamVisionConfig(dtype=jnp.bfloat16)

    cur = jax.jit(
        lambda y: ie._bias_terms_rect(y, rel_h, rel_w, cfg, W, W, W)
    )
    t = timed(cur, y)
    A0, B0 = cur(y)
    print(f"current (P + slice-assembly): {t*1e3:7.2f} ms  A{A0.shape}")

    # --- shared P matmuls ---
    inv = float(hd**0.5)

    def block_diag(rel):
        w = np.zeros((C, H * R), np.float32)
        blk = (np.asarray(rel, np.float32) * inv).T
        for h in range(H):
            w[h * hd:(h + 1) * hd, h * R:(h + 1) * R] = blk
        return jnp.asarray(w, jnp.bfloat16)

    BDh, BDw = block_diag(rel_h), block_diag(rel_w)
    E = selection_onehot(W, H, jnp.bfloat16)  # [14, 432, 224]

    def edot(y):
        q = y[:, :, :C]
        Ph = q @ BDh  # [N, T, H*R]
        Pw = q @ BDw
        P6h = Ph.reshape(N, W, W, H * R)
        P6w = Pw.reshape(N, W, W, H * R)
        # batch over i for A (rows grouped by i), over j for Bb.
        A = jax.lax.dot_general(
            P6h, E, (((3,), (1,)), ((1,), (0,))),
        )  # [W(i), N, W(j), H*W]
        A = A.transpose(1, 0, 2, 3).reshape(N, T, H * W)
        Bb = jax.lax.dot_general(
            P6w, E, (((3,), (1,)), ((2,), (0,))),
        )  # [W(j), N, W(i), H*W]
        Bb = Bb.transpose(1, 2, 0, 3).reshape(N, T, H * W)
        return A.astype(y.dtype), Bb.astype(y.dtype)

    f = jax.jit(edot)
    t = timed(f, y)
    A1, B1 = f(y)
    err = max(
        float(jnp.max(jnp.abs(A1.astype(jnp.float32) - A0.astype(jnp.float32)))),
        float(jnp.max(jnp.abs(B1.astype(jnp.float32) - B0.astype(jnp.float32)))),
    )
    print(f"edot (P + selection dots)   : {t*1e3:7.2f} ms  maxdiff {err:.2e}")

    # --- direct: fold BD @ E into per-i combined weights ---
    # Wh[i] = BDh @ E[i]  -> [W, C, H*W]
    Wh = jnp.einsum("cr,ira->ica", BDh.astype(jnp.float32), E.astype(jnp.float32)).astype(jnp.bfloat16)
    Ww = jnp.einsum("cr,jrb->jcb", BDw.astype(jnp.float32), E.astype(jnp.float32)).astype(jnp.bfloat16)

    def direct(y):
        q = y[:, :, :C].reshape(N, W, W, C)
        A = jax.lax.dot_general(
            q, Wh, (((3,), (1,)), ((1,), (0,))),
        )  # [W(i), N, W(j), H*W]
        A = A.transpose(1, 0, 2, 3).reshape(N, T, H * W)
        Bb = jax.lax.dot_general(
            q, Ww, (((3,), (1,)), ((2,), (0,))),
        )  # [W(j), N, W(i), H*W]
        Bb = Bb.transpose(1, 2, 0, 3).reshape(N, T, H * W)
        return A.astype(y.dtype), Bb.astype(y.dtype)

    f = jax.jit(direct)
    t = timed(f, y)
    A2, B2 = f(y)
    err = max(
        float(jnp.max(jnp.abs(A2.astype(jnp.float32) - A0.astype(jnp.float32)))),
        float(jnp.max(jnp.abs(B2.astype(jnp.float32) - B0.astype(jnp.float32)))),
    )
    print(f"direct (i-batched q dots)   : {t*1e3:7.2f} ms  maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
