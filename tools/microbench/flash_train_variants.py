"""Microbench: flash fwd+bwd block sizes at the stage-1 seq-1024 shape.

STATUS round-3: the flash fwd/bwd pair runs ~3.6x its matmul roofline at
the seq-1024 training point and is the biggest single gap to the >=4.2
img/s verdict ask. Sweeps (block_q, block_k) for the value-and-grad pass
at B=4, H=32, hd=128, S=1024 (the bench's stage-1 operating point).

Env: MB_BQ / MB_BK to pin one fwd config; MB_SWEEP=1 for the sweep.
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

# NOTE: both `from ullava_tpu.ops import attention` and
# `import ullava_tpu.ops.attention as att` resolve to the `attention`
# FUNCTION re-exported by ops/__init__ (the package attribute shadows
# the submodule); importlib returns the module itself.
import importlib

att = importlib.import_module("ullava_tpu.ops.attention")


def fence(o):
    jax.block_until_ready(o)
    return float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0].astype(jnp.float32))


def timed(fn, *a, iters=10):
    fence(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    fence(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, S, H, hd = 4, 1024, 32, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray((0.3 * rng.standard_normal((B, S, H, hd))).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray((0.3 * rng.standard_normal((B, S, H, hd))).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray((0.3 * rng.standard_normal((B, S, H, hd))).astype(np.float32), jnp.bfloat16)
    lens = jnp.full((B,), S, jnp.int32)
    # causal matmul roofline: qk+av fwd (2 dots) + bwd (4 dots at 1.5x...)
    flops_fwd = 2 * 2 * B * H * S * S * hd / 2  # causal half
    print(f"fwd matmul floor ~{flops_fwd/197e12*1e3:.2f} ms, bwd ~{2.5*flops_fwd/197e12*1e3:.2f} ms")

    def vag(bq_f, bk_f, bq_b, bk_b):
        def loss(q, k, v):
            # training path: custom_vjp fwd/bwd kernels
            out = att._flash_attention(q, k, v, lens, 0, True, hd**-0.5, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    # Defaults today: fwd bq=512 bk=1024; bwd 1024x1024.
    f = vag(0, 0, 0, 0)
    print(f"default blocks: {timed(f, q, k, v, iters=5):7.2f} ms (fwd+bwd, loss+grads)")

    # Sweep via monkeypatched defaults (the public fns take block args but
    # the custom_vjp rules call with defaults; patch the module constants).
    orig_fwd = att.flash_attention_fwd
    orig_bwd = att.flash_attention_bwd
    for bq_f, bk_f, bq_b, bk_b in [
        (1024, 1024, 1024, 1024),
        (256, 1024, 1024, 1024),
        (512, 512, 1024, 1024),
        (512, 1024, 512, 1024),
        (512, 1024, 1024, 512),
        (512, 1024, 512, 512),
    ]:
        att.flash_attention_fwd = functools.partial(orig_fwd, block_q=bq_f, block_k=bk_f)
        att.flash_attention_bwd = functools.partial(orig_bwd, block_q=bq_b, block_k=bk_b)
        try:
            f = vag(bq_f, bk_f, bq_b, bk_b)
            t = timed(f, q, k, v, iters=5)
            print(f"fwd {bq_f}x{bk_f} bwd {bq_b}x{bk_b}: {t:7.2f} ms")
        except Exception as e:
            print(f"fwd {bq_f}x{bk_f} bwd {bq_b}x{bk_b}: FAILED {type(e).__name__}")
        finally:
            att.flash_attention_fwd = orig_fwd
            att.flash_attention_bwd = orig_bwd


if __name__ == "__main__":
    main()
