"""Microbench: fused int8-KV decode attention at the B=48 serving shape.

The round-5 decode trace puts `decode_attention_int8_fused_write` at
7.8 ms/step (244 us per layer-step) against a ~170 us KV-DMA floor.
This isolates the kernel (chained in-graph to amortize the axon
dispatch latency) and ablates suspects:

  base     : the production kernel
  nostripe : cache-write stripe logic removed (timing-only: stale cache)
  nomask   : staleness where/iota removed (timing-only: attends garbage)

If nostripe is much faster, the dynamic-sublane-offset stripe slice is
the gap and the write path should move to a 32-row-aligned stripe or a
separate tiny kernel.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

da = importlib.import_module("ullava_tpu.ops.decode_attention")


def make_variant(no_stripe: bool, no_mask: bool):
    base_kernel = da._fused_write_kernel

    def kernel(l_ref, wp_ref, q_ref, kq_ref, ksn_ref, vq_ref, vsn_ref,
               k_ref, v_ref, ks_ref, vs_ref,
               o_ref, ok_ref, ov_ref, oks_ref, ovs_ref,
               *, num_heads, num_kv_heads, head_dim, scale):
        ib = pl.program_id(0)
        H, hd = num_heads, head_dim
        Hkv = num_kv_heads
        C = H * hd
        Ckv = Hkv * hd
        q = q_ref[0]
        qT = jax.lax.transpose(q, (1, 0))
        qrep = jnp.concatenate([qT] * Hkv, axis=0)
        rowc = jax.lax.broadcasted_iota(jnp.int32, (Ckv, H), 0)
        rep = H // Hkv
        W = jnp.where(
            rowc // hd
            == jax.lax.broadcasted_iota(jnp.int32, (Ckv, H), 1) // rep,
            qrep, jnp.zeros((), q.dtype),
        )
        rowh = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
        colc = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)
        emask = (colc // hd == rowh).astype(q.dtype)
        k2 = k_ref[0, 0].astype(q.dtype)
        sc = jax.lax.dot_general(
            k2, W, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ks_ref[0, 0] * scale)
        if not no_mask:
            wp = wp_ref[ib]
            pos = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
            sc = jnp.where(pos < wp, sc, -1e30)
        m = jnp.max(sc, axis=0, keepdims=True)
        p = jnp.exp(sc - m)
        denom = jnp.sum(p, axis=0, keepdims=True)
        pv = (p * vs_ref[0, 0]).astype(q.dtype)
        pvE = jax.lax.dot_general(
            pv, emask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = jnp.sum(pvE * v_ref[0, 0].astype(jnp.float32),
                    axis=0, keepdims=True)
        denomE = jax.lax.dot_general(
            jnp.maximum(denom, 1e-9).astype(q.dtype), emask,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / denomE).astype(o_ref.dtype)
        if no_stripe:
            ok_ref[0, 0] = jnp.zeros_like(ok_ref[0, 0])
            ov_ref[0, 0] = jnp.zeros_like(ov_ref[0, 0])
            oks_ref[0, 0] = jnp.zeros_like(oks_ref[0, 0])
            ovs_ref[0, 0] = jnp.zeros_like(ovs_ref[0, 0])
        else:
            wp = wp_ref[ib]
            base = (wp // 8) * 8
            off = wp - base
            stripe_k = k_ref[0, 0, pl.ds(base, 8), :]
            stripe_v = v_ref[0, 0, pl.ds(base, 8), :]
            stripe_ks = ks_ref[0, 0, pl.ds(base, 8), :]
            stripe_vs = vs_ref[0, 0, pl.ds(base, 8), :]
            selC = jax.lax.broadcasted_iota(jnp.int32, (8, Ckv), 0) == off
            selH = jax.lax.broadcasted_iota(jnp.int32, (8, Hkv), 0) == off
            ok_ref[0, 0] = jnp.where(
                selC, jnp.broadcast_to(kq_ref[0], (8, Ckv)), stripe_k
            )
            ov_ref[0, 0] = jnp.where(
                selC, jnp.broadcast_to(vq_ref[0], (8, Ckv)), stripe_v
            )
            oks_ref[0, 0] = jnp.where(
                selH, jnp.broadcast_to(ksn_ref[0], (8, Hkv)), stripe_ks
            )
            ovs_ref[0, 0] = jnp.where(
                selH, jnp.broadcast_to(vsn_ref[0], (8, Hkv)), stripe_vs
            )

    return kernel


def run_variant(name, kernel_fn, B, H, hd, maxS, L, iters=3, chain=16):
    C = H * hd
    rng = np.random.default_rng(0)
    q = jnp.asarray(0.3 * rng.standard_normal((B, 1, H, hd)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 127, (B, C)), jnp.int8)
    ks = jnp.full((B, H), 0.01, jnp.float32)
    ck = jnp.asarray(rng.integers(-127, 127, (L, B, maxS, C)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 127, (L, B, maxS, C)), jnp.int8)
    cks = jnp.full((L, B, maxS, H), 0.01, jnp.float32)
    cvs = jnp.full((L, B, maxS, H), 0.01, jnp.float32)
    wp = jnp.full((B,), maxS - 8, jnp.int32)
    li = jnp.int32(0)

    call = da.decode_attention_int8_fused_write
    if kernel_fn is not None:
        orig = da._fused_write_kernel
        da._fused_write_kernel = kernel_fn

    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def many(q, ck, cv, cks, cvs):
        o = q
        for _ in range(chain):
            o, ck, cv, cks, cvs = call(
                o, kq, ks, kq, ks, ck, cv, cks, cvs, wp, li, scale=hd**-0.5
            )
        return o, ck, cv, cks, cvs

    try:
        state = (ck, cv, cks, cvs)
        o, *state = many(q, *state)
        _ = float(o.reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            o, *state = many(q, *state)
        _ = float(o.reshape(-1)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters / chain
        dma = 2 * B * maxS * (C + 4 * H) / 819e9
        print(f"{name}: {dt*1e6:8.1f} us/layer-step "
              f"(DMA floor {dma*1e6:.1f} us, x32x32 = {dt*32*32*1e3:.0f} ms/batch-decode)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")
    finally:
        if kernel_fn is not None:
            da._fused_write_kernel = orig


def main():
    B, H, hd, maxS, L = 48, 32, 128, 352, 2
    run_variant("base    ", None, B, H, hd, maxS, L)
    run_variant("nostripe", make_variant(True, False), B, H, hd, maxS, L)
    run_variant("nomask  ", make_variant(False, True), B, H, hd, maxS, L)
    run_variant("neither ", make_variant(True, True), B, H, hd, maxS, L)


if __name__ == "__main__":
    main()
