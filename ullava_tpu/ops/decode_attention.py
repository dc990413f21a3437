"""Fused decode-step attention over an int8-quantized KV cache.

Serving decode is HBM-bandwidth bound: at B=32 / 7B the bf16 KV reads
(~7 ms/step) rival the int8 weight reads. Storing the cache int8 with
per-(position, head) scales halves that traffic — but only if the
dequantization happens in VMEM. A plain XLA dequant materializes the
bf16 cache in HBM first (convert-multiply is not fused into dot
operands), which would cost MORE bandwidth than bf16 storage. This
kernel reads int8 blocks, converts in VMEM, and runs the online-softmax
accumulation per key block.

Math notes (exactness): the per-row key scale is constant over the
contraction dim, so scores fold it post-dot:
  s[k,h] = (sum_d K_q[k,h,d] * q[h,d]) * k_scale[k,h]
and the value scale folds into the probabilities:
  o[h,d] = sum_k (p * v_scale)[k,h] * V_q[k,h,d]
i.e. the kernel is bit-equivalent to attention over the dequantized
cache (up to fp32 reduction order).

Replaces (with `ops/attention.py`) the flash_attn/SDPA decode path of
the reference's HF `generate` loop (`/root/reference/models/ullava.py:350-362`).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., hd] -> (int8 [..., hd], f32 scale [...]) per-row symmetric."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(
    len_ref,  # [B] int32 in SMEM (whole array): valid KV length per row
    q_ref,  # [1, H, hd] f32
    k_ref,  # [1, block_k, H, hd] int8
    v_ref,  # [1, block_k, H, hd] int8
    ks_ref,  # [1, block_k, H] f32
    vs_ref,  # [1, block_k, H] f32
    o_ref,  # [1, H, hd]
    m_ref,  # [H, 128] f32 scratch (lane-broadcast max)
    l_ref,  # [H, 128] f32 scratch
    acc_ref,  # [H, hd] f32 scratch
    *,
    block_k: int,
):
    ib = pl.program_id(0)
    ik = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [H, hd] f32
    k = k_ref[0].astype(jnp.float32)  # [block_k, H, hd]
    ks = ks_ref[0]  # [block_k, H]

    # scores[k, h] = (sum_d K[k,h,d] * q[h,d]) * k_scale[k,h]
    s = jnp.sum(k * q[None], axis=-1) * ks  # [block_k, H]

    kv_len = len_ref[ib]
    pos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(pos < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]  # [H, 1]
    m_blk = jnp.max(s, axis=0)[:, None]  # [H, 1]
    m_new = jnp.maximum(m_prev, m_blk)
    alpha = jnp.exp(m_prev - m_new)  # [H, 1]
    p = jnp.exp(s - m_new[:, 0][None, :])  # [block_k, H]

    v = v_ref[0].astype(jnp.float32)  # [block_k, H, hd]
    pv = p * vs_ref[0]  # fold value scale into probs
    acc_ref[...] = acc_ref[...] * alpha + jnp.sum(pv[..., None] * v, axis=0)
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=0)[:, None]
    m_ref[:, :1] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def decode_attention_int8(
    q: jax.Array,  # [B, 1, H, hd] (scaled by caller? no - raw; scale arg)
    k_q: jax.Array,  # [B, maxS, H, hd] int8
    v_q: jax.Array,  # [B, maxS, H, hd] int8
    k_scale: jax.Array,  # [B, maxS, H] f32
    v_scale: jax.Array,  # [B, maxS, H] f32
    kv_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Single-token decode attention; returns [B, 1, H, hd] in q.dtype."""
    B, S1, H, hd = q.shape
    assert S1 == 1
    maxS = k_q.shape[1]
    while block_k > 128 and maxS % block_k:
        block_k //= 2
    if maxS % block_k:
        block_k = maxS  # degenerate small cache: one block
    qf = (q[:, 0] * scale).astype(jnp.float32)

    grid = (B, maxS // block_k)
    kv_spec = pl.BlockSpec(
        (1, block_k, H, hd), lambda b, ik: (b, ik, 0, 0), memory_space=pltpu.VMEM
    )
    sc_spec = pl.BlockSpec(
        (1, block_k, H), lambda b, ik: (b, ik, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, hd), lambda b, ik: (b, 0, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            sc_spec,
            sc_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, H, hd), lambda b, ik: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, hd), jnp.float32),
        ],
        interpret=interpret,
    )(
        kv_lens.astype(jnp.int32),
        qf,
        k_q,
        v_q,
        k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
    )
    return out[:, None]


def decode_attention_int8_xla(
    q, k_q, v_q, k_scale, v_scale, kv_lens, *, scale: float
) -> jax.Array:
    """Reference path: dequantize in XLA and run plain attention. Used for
    kernel parity tests and non-TPU backends."""
    from ullava_tpu.ops.attention import attention_xla

    k = (k_q.astype(jnp.float32) * k_scale[..., None]).astype(q.dtype)
    v = (v_q.astype(jnp.float32) * v_scale[..., None]).astype(q.dtype)
    return attention_xla(q, k, v, causal=False, kv_lens=kv_lens, scale=scale)
