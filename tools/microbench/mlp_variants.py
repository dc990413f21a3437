"""Microbench: fused_mlp_block variants at the ViT-H serving shape.

Variant hypotheses for closing the 268 -> 387 TF/s gap (the XLA int8
rate on the LLM prefill matmuls):
  base      : current kernel (f_chunk auto=1024)
  f2560     : bigger F chunks (fewer VPU epilogue barriers)
  split2    : manual 2-way sub-chunk interleave inside the program so the
              second sub-chunk's fc1 (MXU) is independent of the first's
              GELU+quant (VPU) and Mosaic may overlap them
  deg4      : degree-4 erf polynomial (halves GELU FMA count)
"""
import functools, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp, numpy as np

from ullava_tpu.ops import mlp_kernel as mk

T, C, F = 150528, 1280, 5120   # half the B=48 interior tile (VMEM-friendly iter count)
FLOPS = 2 * T * C * F * 2

def bench(fn, *args, iters=20):
    o = fn(*args); o.block_until_ready()
    # host-read fence (axon tunnel: block_until_ready alone unreliable)
    _ = np.asarray(o[0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    _ = np.asarray(o[0, :1])
    dt = (time.perf_counter() - t0) / iters
    return dt, o

def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, C)), jnp.bfloat16)
    ln_s = jnp.ones((C,), jnp.bfloat16); ln_b = jnp.zeros((C,), jnp.bfloat16)
    w1 = jnp.asarray(rng.integers(-127, 127, (C, F)), jnp.int8)
    s1 = jnp.full((1, F), 0.01, jnp.float32); b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.integers(-127, 127, (F, C)), jnp.int8)
    s2 = jnp.full((1, C), 0.01, jnp.float32); b2 = jnp.zeros((C,), jnp.float32)
    args = (x, ln_s, ln_b, w1, s1, b1, w2, s2, b2)

    base = jax.jit(functools.partial(mk.fused_mlp_block, w8a8=True, eps=1e-6))
    dt, o0 = bench(base, *args)
    print(f"base f1024 : {dt*1e3:7.2f} ms  {FLOPS/dt/1e12:6.1f} TF/s")

    for fc in (2560, 5120):
        f = jax.jit(functools.partial(mk.fused_mlp_block, w8a8=True, eps=1e-6, f_chunk=fc))
        dt, o = bench(f, *args)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32))))
        print(f"f_chunk {fc:4d}: {dt*1e3:7.2f} ms  {FLOPS/dt/1e12:6.1f} TF/s  maxdiff {err:.3e}")

    for bt in (1536,):
        for fc in (1024, 2560, 5120):
            if T % bt or F % fc:
                continue
            f = jax.jit(functools.partial(mk.fused_mlp_block, w8a8=True, eps=1e-6, block_t=bt, f_chunk=fc))
            dt, o = bench(f, *args)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32))))
            print(f"bt{bt:4d} fc{fc:4d}: {dt*1e3:7.2f} ms  {FLOPS/dt/1e12:6.1f} TF/s  maxdiff {err:.3e}")

    if hasattr(mk, "fused_mlp_block_v2"):
        for kw in (
            {},
            {"block_t": 512},
            {"f_chunk": 2560},
            {"block_t": 512, "f_chunk": 2560},
            {"block_t": 1536},
        ):
            if (T % kw.get("block_t", 512)) or (F % kw.get("f_chunk", 1024)):
                continue
            f = jax.jit(functools.partial(mk.fused_mlp_block_v2, eps=1e-6, **kw))
            dt, o = bench(f, *args)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o0.astype(jnp.float32))))
            print(f"v2 {kw}: {dt*1e3:7.2f} ms  {FLOPS/dt/1e12:6.1f} TF/s  maxdiff {err:.3e}")

if __name__ == "__main__":
    main()
