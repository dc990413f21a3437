"""Attention: XLA reference path + Pallas flash-attention TPU kernel.

The flash kernel implements online-softmax tiling (never materializes the
[Sq, Sk] score matrix in HBM), with causal block skipping and per-batch
KV-length masking for padded batches. The backward is fused too: dq/dkv
Pallas kernels recompute probability tiles from the saved logsumexp, so
neither direction touches [Sq, Sk] in HBM. Measured on v5e (7B train
step, seq 1024): 3.09 img/s vs 2.79 (flash fwd + XLA-recompute bwd) vs
2.70 (pure XLA); XLA still wins at seq 384, hence the 512 dispatch
crossover in `attention`.

Replaces the torch SDPA/eager attention used throughout the reference's
towers (LLaMA decoder, CLIP ViT, SAM encoder/two-way transformer).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def attention_xla(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, Hkv, D]
    v: jax.Array,  # [B, Sk, Hkv, D]
    *,
    causal: bool = False,
    kv_lens: Optional[jax.Array] = None,  # [B] valid KV length per batch row
    bias: Optional[jax.Array] = None,  # [B, 1|H, Sq, Sk] additive bias
    q_offset: int | jax.Array = 0,  # absolute position of q[0] (cached decode)
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference attention via einsum; fp32 softmax."""
    b, sq, h, d = q.shape
    sk, hkv = k.shape[1], k.shape[2]
    if hkv != h:
        k = _repeat_kv(k, h // hkv)
        v = _repeat_kv(v, h // hkv)
    if scale is None:
        scale = d**-0.5

    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    mask = None
    if causal:
        q_pos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = (k_pos <= q_pos)[None, None]
    if kv_lens is not None:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (b, sk), 1)
        valid = (k_pos < kv_lens[:, None])[:, None, None, :]  # [B,1,1,Sk]
        mask = valid if mask is None else jnp.logical_and(mask, valid)
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash forward
# ---------------------------------------------------------------------------


def _flash_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B] int32 in SMEM
    # inputs (blocked)
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]
    v_ref,  # [1, 1, BK, D]
    # outputs
    o_ref,  # [1, 1, BQ, D]
    lse_ref,  # [1, 1, BQ, 8] f32 logsumexp per q row (lane-bcast)
    # scratch
    m_ref,  # [BQ, 128] f32 running max
    l_ref,  # [BQ, 128] f32 running denom
    acc_ref,  # [BQ, D] f32 accumulator
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    q_offset: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_len = kv_lens_ref[b]
    q_start = q_offset + iq * block_q
    k_start = ik * block_k

    # Causal block skip: the whole k block is in the future of every q row.
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    run = jnp.logical_and(run, k_start < kv_len)

    @pl.when(run)
    def _compute():
        # bf16 matmul inputs, fp32 accumulation (casting inputs to fp32
        # would run the MXU at a fraction of its bf16 rate).
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BK]

        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos < kv_len
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, :1]  # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # Guard fully-masked rows (m_new == -inf) against NaN from exp.
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)

        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked q rows -> zeros
        o_ref[0, 0, ...] = (acc_ref[...] / safe_l).astype(o_ref.dtype)
        # logsumexp per q row for the fused backward; +big for fully-masked
        # rows so their recomputed probabilities are exactly zero.
        lse = jnp.where(l == 0.0, 1e30, m_ref[:, :1] + jnp.log(safe_l))
        lse_ref[0, 0, ...] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def flash_attention_fwd(
    q: jax.Array,  # [B, H, Sq, D]
    k: jax.Array,  # [B, H, Sk, D]
    v: jax.Array,
    kv_lens: jax.Array,  # [B] int32
    *,
    causal: bool,
    scale: float,
    q_offset: int = 0,
    block_q: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    # Auto blocks (measured on v5e, 7B shapes): sq//2 x full-k wins at
    # S=1024 (1.95 vs 2.37 ms for the old 256/512) AND at S=512 (where it
    # resolves to the old default). Round-5 re-sweep at the seq-1024
    # training point (B=4, value_and_grad, tools/microbench/
    # flash_train_variants.py): whole-seq 1024x1024 fwd blocks beat
    # 512x1024 by ~15% (13.37 vs 15.72 ms incl dispatch) — fewer q-tile
    # passes re-reading k/v.
    auto_bq = 1024 if sq % 1024 == 0 else min(512, max(256, sq // 2))
    block_q = min(block_q or auto_bq, sq)
    block_k = min(block_k or 1024, sk)
    grid = (b, h, pl.cdiv(sq, block_q), pl.cdiv(sk, block_k))

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        q_offset=q_offset,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        # Index maps receive the scalar-prefetch ref as a trailing argument.
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda b, h, iq, ik, *_: (b, h, ik, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda b, h, iq, ik, *_: (b, h, ik, 0)
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_q, 8), lambda b, h, iq, ik, *_: (b, h, iq, 0)
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            # lse broadcast over 8 lanes: pallas blocks need tile-compliant
            # trailing dims ((8,128)-divisible or full)
            jax.ShapeDtypeStruct((b, h, sq, 8), jnp.float32),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q, k, v)


# ---------------------------------------------------------------------------
# Lane-sliced flash forward (serving prefill): consumes q/k/v in their
# native [B, S, H, hd] row-major layout via per-head 128-lane BlockSpec
# slices — the [B,S,H,hd] -> [B,H,S,hd] staging transposes (~100 ms per
# B=32 7B prefill, three 84 MB HBM round trips per layer) never exist.
# Same trick as the SAM grid kernels (`ops/sam_attention.py`). Forward
# only: the training path keeps the transpose-based kernel whose fused
# backward needs the saved logsumexp.
# ---------------------------------------------------------------------------


def _flash_bsh_kernel(
    kv_lens_ref,  # [B] int32 SMEM
    q_ref,  # [1, BQ, hg*hd] lane slice covering head group g
    k_ref,  # [1, BK, hgkv*hd]
    v_ref,  # [1, BK, hgkv*hd]
    o_ref,  # [1, BQ, hg*hd]
    m_ref, l_ref, acc_ref,  # [hg, BQ, 128/128/hd]
    *, causal: bool, scale: float, block_q: int, block_k: int, q_offset: int,
    head_group: int, head_dim: int, rep: int, seq_k: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    hg, hd = head_group, head_dim

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_len = kv_lens_ref[b]
    q_start = q_offset + iq * block_q
    k_start = ik * block_k

    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    run = jnp.logical_and(run, k_start < kv_len)

    @pl.when(run)
    def _compute():
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = k_pos < kv_len
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        # Rows past the ARRAY bound (last partial k block) are garbage the
        # DMA paged in; their p entries are zeroed, but 0 * garbage must
        # not be 0 * NaN — zero the v rows themselves.
        vmask = None
        if seq_k % block_k:
            vmask = (
                k_start
                + jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, head_dim), 0
                )
                < seq_k
            )
        for h in range(hg):
            q = q_ref[0, :, h * hd:(h + 1) * hd]
            hk = h // rep
            k = k_ref[0, :, hk * hd:(hk + 1) * hd]
            v = v_ref[0, :, hk * hd:(hk + 1) * hd]
            if vmask is not None:
                v = jnp.where(vmask, v, jnp.zeros((), v.dtype))
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_ref[h, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            # Masked entries: exp(_NEG_INF - m_new) == 0 exactly whenever
            # the row has any live key (finite m_new); fully-masked rows
            # are invalid outputs by contract (beyond kv_len), so no
            # second where(mask, p, 0) pass is needed.
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_ref[h, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h] = jnp.broadcast_to(m_new, (block_q, 128))
            l_ref[h] = jnp.broadcast_to(l_new, (block_q, 128))

    @pl.when(ik == nk - 1)
    def _finalize():
        for h in range(hg):
            l = l_ref[h, :, :1]
            safe_l = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_ref[h] / safe_l
            ).astype(o_ref.dtype)


def flash_attention_fwd_bsh(
    q: jax.Array,  # [B, Sq, H, hd]
    k: jax.Array,  # [B, Sk, Hkv, hd]
    v: jax.Array,
    kv_lens: jax.Array,  # [B] int32
    *,
    causal: bool,
    scale: float,
    q_offset: int = 0,
    block_q: int = 1024,
    block_k: int = 1024,
    head_group: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over row-major token layouts; returns [B, Sq, H, hd].
    Supports GQA (k/v head group picked by lane-block index map).

    `head_group` heads run per grid program (0 = auto). Measured at the
    serving prefill shape (B=32, S=640, H=32, hd=128, v5e): the per-head
    256/512-block grid is 6k programs whose fixed cost dominates (12.2 ms
    device time, ~9 TFLOP/s); grouped heads + whole-seq blocks cut it to
    ~4.5 ms (hg=4..8, 128 programs)."""
    B, Sq, H, hd = q.shape
    Sk, Hkv = k.shape[1], k.shape[2]
    assert H % Hkv == 0
    rep = H // Hkv
    q3 = q.reshape(B, Sq, H * hd)
    k3 = k.reshape(B, Sk, Hkv * hd)
    v3 = v.reshape(B, Sk, Hkv * hd)
    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    if head_group <= 0:
        # Auto: the largest group (<= 8; larger measures flat-to-worse)
        # whose double-buffered working set fits VMEM, else halve. KV
        # lanes are hg/rep wide so GQA shrinks the k/v blocks with it.
        head_group = min(H, 8)
        while head_group > 1:
            kv_lanes = max(head_group // rep, 1) * hd
            bytes_ = (
                4 * block_q * head_group * hd  # q + o (2 arrays, ~2 B)
                + 4 * block_k * kv_lanes  # k + v
                + head_group * block_q * (2 * 128 + hd) * 4  # f32 scratch
                + block_q * block_k * 4  # f32 score tile
            )
            if bytes_ * 2 <= 96 * 1024 * 1024:
                break
            head_group //= 2
    while head_group > 1 and (H % head_group or head_group % rep and rep % head_group):
        head_group //= 2
    hg = head_group
    hg_kv = max(hg // rep, 1)
    # In-kernel q-head -> kv-lane divisor: when the group is narrower
    # than the GQA repeat, every q head in the program shares the block's
    # single kv head (h // hg == 0 for all h < hg).
    krep = rep if hg >= rep else hg

    kernel = functools.partial(
        _flash_bsh_kernel, causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, q_offset=q_offset,
        head_group=hg, head_dim=hd, rep=krep, seq_k=Sk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hg, pl.cdiv(Sq, block_q), pl.cdiv(Sk, block_k)),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, hg * hd), lambda b, g, iq, ik, *_: (b, iq, g)
            ),
            pl.BlockSpec(
                (1, block_k, hg_kv * hd),
                lambda b, g, iq, ik, *_: (b, ik, g * hg // rep // hg_kv),
            ),
            pl.BlockSpec(
                (1, block_k, hg_kv * hd),
                lambda b, g, iq, ik, *_: (b, ik, g * hg // rep // hg_kv),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hg * hd), lambda b, g, iq, ik, *_: (b, iq, g)
        ),
        scratch_shapes=[
            pltpu.VMEM((hg, block_q, 128), jnp.float32),
            pltpu.VMEM((hg, block_q, 128), jnp.float32),
            pltpu.VMEM((hg, block_q, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Sq, H * hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q3, k3, v3)
    return out.reshape(B, Sq, H, hd)


# ---------------------------------------------------------------------------
# Pallas flash backward (dq / dkv kernels, tiled probability recompute)
# ---------------------------------------------------------------------------


def _bwd_mask_and_p(q, k, lse, kv_len, q_start, k_start, block_q, block_k,
                    causal, scale):
    """Recompute the probability tile p = exp(s*scale - lse) with the
    forward's exact masking."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK]
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = k_pos < kv_len
    if causal:
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(mask, k_pos <= q_pos)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) - lse)
    return jnp.where(mask, p, 0.0)


def _flash_bwd_dkv_kernel(
    kv_lens_ref,
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, causal, scale, block_q, block_k, q_offset,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kv_len = kv_lens_ref[b]
    q_start = q_offset + iq * block_q
    k_start = ik * block_k
    run = jnp.asarray(k_start) < kv_len
    if causal:
        # q blocks entirely before this k block contribute nothing.
        run = jnp.logical_and(run, q_start + block_q - 1 >= k_start)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]  # [BQ, 1]
        delta = delta_ref[0, 0][:, :1]

        p = _bwd_mask_and_p(q, k, lse, kv_len, q_start, k_start,
                            block_q, block_k, causal, scale)
        # dv += p^T @ dO
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ds = p * (dO @ v^T - delta) * scale; dk += ds^T @ q
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0, ...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0, ...] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    kv_lens_ref,
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
    dq_ref,
    dq_acc,
    *, causal, scale, block_q, block_k, q_offset,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    kv_len = kv_lens_ref[b]
    q_start = q_offset + iq * block_q
    k_start = ik * block_k
    run = jnp.asarray(k_start) < kv_len
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        delta = delta_ref[0, 0][:, :1]

        p = _bwd_mask_and_p(q, k, lse, kv_len, q_start, k_start,
                            block_q, block_k, causal, scale)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        dq_acc[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0, ...] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention_bwd(
    q, k, v, out, lse, do, kv_lens,
    *, causal, scale, q_offset=0, block_q=0, block_k=0, interpret=False,
):
    """[B, H, S, D] layouts; returns (dq, dk, dv).

    Auto blocks: 1024x1024 clamped to the sequence (measured on v5e at
    7B shapes: -25% vs the old 256/512 at S=1024, -16% at S=512)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q or 1024, sq)
    block_k = min(block_k or 1024, sk)

    # delta_i = rowsum(dO_i * O_i) — cheap elementwise, XLA fuses it.
    delta = jnp.einsum(
        "bhqd,bhqd->bhq", do.astype(jnp.float32), out.astype(jnp.float32)
    )
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (8,))

    # dkv pass: grid (B, H, nK, nQ), q innermost.
    common = dict(causal=causal, scale=scale, block_q=block_q,
                  block_k=block_k, q_offset=int(q_offset))
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, pl.cdiv(sk, block_k), pl.cdiv(sq, block_q)),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, ik, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, ik, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, ik, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, ik, iq, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, ik, iq, *_: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, ik, iq, *_: (b, h, ik, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, ik, iq, *_: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, ik, iq, *_: (b, h, ik, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid_spec=dkv_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sk, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), q.dtype),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q, do, lse, delta, k, v)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, pl.cdiv(sq, block_q), pl.cdiv(sk, block_k)),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, iq, ik, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, iq, ik, *_: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, iq, ik, *_: (b, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, iq, ik, *_: (b, h, ik, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, iq, ik, *_: (b, h, iq, 0)
        ),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), q, do, lse, delta, k, v)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public entry with custom VJP (flash fwd, flash bwd)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, kv_lens, q_offset, causal, scale, interpret):
    # Primal (the no-grad serving path — custom_vjp only routes through
    # the fwd/bwd rules under differentiation): lane-sliced kernel over
    # the native [B, S, H, D] layout, no staging transposes.
    return flash_attention_fwd_bsh(
        q, k, v, kv_lens, causal=causal, scale=scale,
        q_offset=int(q_offset), interpret=interpret,
    )


def _flash_fwd_rule(q, k, v, kv_lens, q_offset, causal, scale, interpret):
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out, lse = flash_attention_fwd(
        qt, kt, vt, kv_lens, causal=causal, scale=scale,
        q_offset=int(q_offset), interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3), (qt, kt, vt, out, lse, kv_lens)


def _flash_bwd_rule(q_offset, causal, scale, interpret, residuals, g):
    qt, kt, vt, out, lse, kv_lens = residuals
    dq, dk, dv = flash_attention_bwd(
        qt, kt, vt, out, lse, g.transpose(0, 2, 1, 3), kv_lens,
        causal=causal, scale=scale, q_offset=q_offset, interpret=interpret,
    )
    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3),
        dv.transpose(0, 2, 1, 3),
        None,
    )


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def attention(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, Sk, Hkv, D]
    v: jax.Array,
    *,
    causal: bool = False,
    kv_lens: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    q_offset: int | jax.Array = 0,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching attention entry point.

    impl: 'auto' picks the flash kernel on TPU for large-enough prefill
    shapes without custom bias; 'xla' forces the reference path; 'flash'
    forces the kernel (interpreted off-TPU, for tests).
    """
    b, sq, h, d = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = d**-0.5

    flash_ok = (
        bias is None
        and sq >= 128
        and d % 128 == 0
        and isinstance(q_offset, int)
        and h == hkv
    )
    if impl == "auto":
        # Measured crossover on v5e (7B train step): XLA's fused full-score
        # attention wins at seq 384 (9.32 vs 8.76 img/s); the flash kernel
        # wins at seq 1024 (2.79 vs 2.70). Dispatch flash from 512 up.
        impl = "flash" if (flash_ok and sq >= 512 and _on_tpu()) else "xla"
    if impl == "flash" and not flash_ok:
        raise ValueError(
            "flash attention requires no bias, Sq>=128, head_dim%128==0, "
            "static q_offset, and no GQA repeat"
        )

    if impl == "xla":
        return attention_xla(
            q, k, v, causal=causal, kv_lens=kv_lens, bias=bias,
            q_offset=q_offset, scale=scale,
        )
    if impl in ("flash", "flash_interpret"):
        if kv_lens is None:
            kv_lens = jnp.full((b,), k.shape[1], dtype=jnp.int32)
        return _flash_attention(
            q, k, v, kv_lens, int(q_offset), causal, scale,
            impl == "flash_interpret",
        )
    raise ValueError(f"unknown attention impl: {impl}")
