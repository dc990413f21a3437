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
    l_ref,  # [1] int32 scalar-prefetch: layer index (consumed by index maps)
    len_ref,  # [B] int32 in SMEM (whole array): valid KV length per row
    q_ref,  # [bb, H, hd] q.dtype (pre-scaled)
    k_ref,  # [1, bb, S, Ckv] int8 (this layer's rows, heads merged on lanes)
    v_ref,  # [1, bb, S, Ckv] int8
    ks_ref,  # [1, bb, S, Hkv] f32
    vs_ref,  # [1, bb, S, Hkv] f32
    o_ref,  # [bb, 1, C]
    *,
    block_b: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: float,
):
    # One program handles `block_b` batch rows over the FULL cache (maxS
    # for RES serving is a few hundred -> whole row fits VMEM, no online
    # softmax). Both dots run in standard MXU orientation (lhs lanes x
    # rhs sublanes):
    #   scores = k2 @ W,  W[c, h'] = q[h'(c), c % hd] * [c // hd == h']
    # (a block-diagonal q built by one tiny [H, hd] transpose + sublane
    # tiling - NO reshape, which Mosaic rejects, and no operand-transpose
    # dot, which cost ~1 ms/layer relayouting the 5.8 MB k block), and
    #   out = sum_s (p v-scaled expanded via the block mask) * v2.
    # The H x padded MXU work is free - the op is HBM-bandwidth bound -
    # while the first per-element formulation lane-reduced on the VPU and
    # measured 45 ms per 7B decode step at B=32 (vs ~18 bf16-cache).
    ib = pl.program_id(0)
    H, hd = num_heads, head_dim
    Hkv = num_kv_heads
    rep = H // Hkv
    C = H * hd  # output lanes (q heads)
    Ckv = Hkv * hd  # cache lanes (kv heads)
    S = k_ref.shape[2]
    rowc = jax.lax.broadcasted_iota(jnp.int32, (Ckv, H), 0)
    colh = jax.lax.broadcasted_iota(jnp.int32, (Ckv, H), 1)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)
    emask = (colc // hd == rowh).astype(q_ref.dtype)  # [H, C] expansion
    # GQA scale expansion [Hkv, H]: kv head g feeds q heads [g*rep, (g+1)*rep).
    semask = (
        jax.lax.broadcasted_iota(jnp.int32, (Hkv, H), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (Hkv, H), 1) // rep
    ).astype(jnp.float32)
    for b in range(block_b):
        q = q_ref[b]  # [H, hd]
        qT = jax.lax.transpose(q, (1, 0))  # [hd, H] (tiny)
        # W[c, h] = q[h, c % hd] if the cache row's kv head (c // hd)
        # serves q head h, else 0 — GQA folds into the same one-dot form.
        qrep = jnp.concatenate([qT] * Hkv, axis=0)  # [Ckv, H]
        W = jnp.where(rowc // hd == colh // rep, qrep, jnp.zeros((), q.dtype))
        k2 = k_ref[0, b].astype(q.dtype)  # [S, Ckv]
        sc = jax.lax.dot_general(
            k2, W, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, H]
        # Softmax scale folds into the fp32 key-scale multiply here (not a
        # bf16 pre-scale of q, which would add a rounding step the XLA
        # reference path doesn't have). GQA expands the [S, Hkv] scales to
        # q-head columns with a 0/1 dot (exact).
        ks = ks_ref[0, b]
        vs = vs_ref[0, b]
        if rep > 1:
            ks = jax.lax.dot_general(
                ks, semask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vs = jax.lax.dot_general(
                vs, semask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        sc = sc * (ks * scale)
        kv_len = len_ref[ib * block_b + b]
        pos = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
        sc = jnp.where(pos < kv_len, sc, _NEG_INF)
        m = jnp.max(sc, axis=0, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        pv = (p * vs).astype(q.dtype)  # [S, H]
        pvE = jax.lax.dot_general(
            pv, emask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, C]: prob of row s broadcast across its head's lanes
        v2 = v_ref[0, b].astype(jnp.float32)  # [S, Ckv]
        if rep > 1:
            # Expand kv-head value lanes to q-head lanes (hd-aligned
            # VMEM lane slices, one per q head).
            v2 = jnp.concatenate(
                [v2[:, (h // rep) * hd:(h // rep + 1) * hd]
                 for h in range(H)],
                axis=1,
            )  # [S, C]
        o = jnp.sum(pvE * v2, axis=0, keepdims=True)  # [1, C]
        o_ref[b] = o.astype(o_ref.dtype)


def decode_attention_int8(
    q: jax.Array,  # [B, 1, H, hd]
    cache_k: jax.Array,  # [L, B, maxS, C] int8 (heads merged on lanes)
    cache_v: jax.Array,  # [L, B, maxS, C] int8
    k_scale: jax.Array,  # [L, B, maxS, H] f32
    v_scale: jax.Array,  # [L, B, maxS, H] f32
    kv_lens: jax.Array,  # [B] int32
    layer_idx: jax.Array,  # [] int32
    *,
    scale: float,
    block_b: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Single-token decode attention over the FULL stacked int8 cache;
    returns [B, 1, H, hd] in q.dtype.

    The layer index arrives as a scalar-prefetch operand feeding the
    BlockSpec index maps, so the kernel DMAs its blocks straight out of
    the stacked cache — the per-layer dynamic-slice copies (2 x 46 MB at
    7B/B=32) never exist, and the [.., H, hd] -> [.., C] lane merge is
    free because the cache is STORED pre-merged."""
    B, S1, H, hd = q.shape
    assert S1 == 1
    L, _, maxS, Ckv = cache_k.shape
    Hkv = Ckv // hd
    C = H * hd
    while block_b > 1 and B % block_b:
        block_b //= 2
    qs = q[:, 0]

    kv_spec = pl.BlockSpec(
        (1, block_b, maxS, Ckv), lambda b, l_ref: (l_ref[0], b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sc_spec = pl.BlockSpec(
        (1, block_b, maxS, Hkv), lambda b, l_ref: (l_ref[0], b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, H, hd), lambda b, l_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            sc_spec,
            sc_spec,
        ],
        out_specs=pl.BlockSpec(
            (block_b, 1, C), lambda b, l_ref: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_b=block_b, num_heads=H, num_kv_heads=Hkv,
            head_dim=hd, scale=scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1).astype(jnp.int32),
        kv_lens.astype(jnp.int32),
        qs,
        cache_k,
        cache_v,
        k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
    )
    return out.reshape(B, 1, H, hd)


def _fused_write_kernel(
    l_ref,  # [1] int32 scalar-prefetch: layer index
    wp_ref,  # [B] int32 scalar-prefetch: per-row write position (feeds the
    #          cache-row output index maps AND the staleness mask)
    q_ref,  # [1, H, hd] q.dtype
    kq_ref,  # [1, 1, Ckv] int8: quantized new key row (heads merged on lanes)
    ksn_ref,  # [1, 1, Hkv] f32: its per-head scales
    vq_ref,  # [1, 1, Ckv] int8
    vsn_ref,  # [1, 1, Hkv] f32
    k_ref,  # [1, 1, S, Ckv] int8 (this layer's cache rows for this sample)
    v_ref,  # [1, 1, S, Ckv] int8
    ks_ref,  # [1, 1, S, Hkv] f32
    vs_ref,  # [1, 1, S, Hkv] f32
    o_ref,  # [1, 1, C] attention output
    ok_ref,  # [1, 1, 8, Ckv] int8: cache write stripe (aliased with k_ref's buffer)
    ov_ref,  # [1, 1, 8, Ckv] int8
    oks_ref,  # [1, 1, 8, Hkv] f32
    ovs_ref,  # [1, 1, 8, Hkv] f32
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: float,
):
    # One program = one batch row. The new token's K/V row never round-trips
    # through an XLA scatter: this kernel is the only HBM pass — it reads the
    # historical cache block, attends (with the current token's score computed
    # from the in-VMEM new row), and DMAs the row out through an aliased
    # 8-row output stripe (Mosaic requires sublane-multiple windows; the
    # other 7 rows are re-emitted from the in-VMEM input block), whose index
    # maps target (layer, b, write_pos[b] // 8) via scalar prefetch.
    # GQA (Hkv < H) folds into the same dots: the block-diagonal q operand
    # maps each cache kv head to its `rep` q heads, scales expand through a
    # 0/1 dot, and value lanes expand by hd-aligned VMEM lane slices.
    ib = pl.program_id(0)
    H, hd = num_heads, head_dim
    Hkv = num_kv_heads
    rep = H // Hkv
    C = H * hd
    Ckv = Hkv * hd
    rowc = jax.lax.broadcasted_iota(jnp.int32, (Ckv, H), 0)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)
    emask = (colc // hd == rowh).astype(q_ref.dtype)  # [H, C] expansion
    semask = (
        jax.lax.broadcasted_iota(jnp.int32, (Hkv, H), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (Hkv, H), 1) // rep
    ).astype(jnp.float32)

    def expand_scales(x):  # [.., Hkv] -> [.., H] (exact 0/1 dot)
        if rep == 1:
            return x
        return jax.lax.dot_general(
            x, semask, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def expand_values(v):  # [.., Ckv] f32 -> [.., C]
        if rep == 1:
            return v
        return jnp.concatenate(
            [v[..., (h // rep) * hd:(h // rep + 1) * hd] for h in range(H)],
            axis=-1,
        )

    q = q_ref[0]  # [H, hd]
    qT = jax.lax.transpose(q, (1, 0))  # [hd, H] (tiny)
    qrep = jnp.concatenate([qT] * Hkv, axis=0)  # [Ckv, H]: row c -> q[:, c%hd]
    W = jnp.where(rowc // hd == jax.lax.broadcasted_iota(jnp.int32, (Ckv, H), 1) // rep,
                  qrep, jnp.zeros((), q.dtype))
    k2 = k_ref[0, 0].astype(q.dtype)  # [S, Ckv]
    sc = jax.lax.dot_general(
        k2, W, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [S, H]
    sc = sc * (expand_scales(ks_ref[0, 0]) * scale)
    # Rows at/after write_pos are stale (the new row is added in-register
    # below, before it ever reaches HBM).
    wp = wp_ref[ib]
    pos = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
    sc = jnp.where(pos < wp, sc, _NEG_INF)
    # Current token's score/value from the quantized new row — identical
    # math to a cache row (dequantize-in-dot + fp32 scale fold), so the
    # result is bit-comparable to attending over the written cache.
    kqf = kq_ref[0].astype(q.dtype)  # [1, Ckv]
    s_cur = jax.lax.dot_general(
        kqf, W, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) * (expand_scales(ksn_ref[0]) * scale)  # [1, H]
    m = jnp.maximum(jnp.max(sc, axis=0, keepdims=True), s_cur)
    p = jnp.exp(sc - m)  # [S, H]
    p_cur = jnp.exp(s_cur - m)  # [1, H]
    denom = jnp.sum(p, axis=0, keepdims=True) + p_cur  # [1, H]
    pv = (p * expand_scales(vs_ref[0, 0])).astype(q.dtype)  # [S, H]
    pvE = jax.lax.dot_general(
        pv, emask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [S, C]
    o = jnp.sum(pvE * expand_values(v_ref[0, 0].astype(jnp.float32)),
                axis=0, keepdims=True)
    pvc = (p_cur * expand_scales(vsn_ref[0])).astype(q.dtype)  # [1, H]
    pvcE = jax.lax.dot_general(
        pvc, emask, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [1, C]
    o = o + pvcE * expand_values(vq_ref[0].astype(jnp.float32))
    denomE = jax.lax.dot_general(
        denom.astype(q.dtype), emask, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, C]
    o_ref[0] = (o / denomE).astype(o_ref.dtype)
    # Cache writes: re-emit the 8-row sublane stripe containing write_pos
    # with row wp%8 replaced by the new row. Placement happens in the
    # output index maps; every output block is written once per program.
    base = (wp // 8) * 8
    off = wp - base
    stripe_k = k_ref[0, 0, pl.ds(base, 8), :]  # [8, Ckv]
    stripe_v = v_ref[0, 0, pl.ds(base, 8), :]
    stripe_ks = ks_ref[0, 0, pl.ds(base, 8), :]  # [8, Hkv]
    stripe_vs = vs_ref[0, 0, pl.ds(base, 8), :]
    selC = jax.lax.broadcasted_iota(jnp.int32, (8, Ckv), 0) == off
    selH = jax.lax.broadcasted_iota(jnp.int32, (8, Hkv), 0) == off
    ok_ref[0, 0] = jnp.where(selC, jnp.broadcast_to(kq_ref[0], (8, Ckv)), stripe_k)
    ov_ref[0, 0] = jnp.where(selC, jnp.broadcast_to(vq_ref[0], (8, Ckv)), stripe_v)
    oks_ref[0, 0] = jnp.where(selH, jnp.broadcast_to(ksn_ref[0], (8, Hkv)), stripe_ks)
    ovs_ref[0, 0] = jnp.where(selH, jnp.broadcast_to(vsn_ref[0], (8, Hkv)), stripe_vs)


def decode_attention_int8_fused_write(
    q: jax.Array,  # [B, 1, H, hd]
    kq_new: jax.Array,  # [B, C] int8 quantized new key rows (lanes merged)
    ks_new: jax.Array,  # [B, H] f32
    vq_new: jax.Array,  # [B, C] int8
    vs_new: jax.Array,  # [B, H] f32
    cache_k: jax.Array,  # [L, B, maxS, C] int8 — donated, returned updated
    cache_v: jax.Array,  # [L, B, maxS, C] int8
    k_scale: jax.Array,  # [L, B, maxS, H] f32
    v_scale: jax.Array,  # [L, B, maxS, H] f32
    write_pos: jax.Array,  # [B] int32 current token's cache position
    layer_idx: jax.Array,  # [] int32
    *,
    scale: float,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-token decode attention that also WRITES the new KV row.

    Replaces the XLA quantize-scatter (4 scatters + a full kernel launch
    chain, ~14 ms/step at 7B/B=32) with in-kernel row writes through
    aliased output windows: the cache makes exactly one HBM pass per
    step. Returns (attn [B,1,H,hd], cache_k', cache_v', k_scale',
    v_scale') — the cache operands are aliased in place under jit.

    Replaces the KV-cache append + SDPA of the reference's HF `generate`
    loop (`/root/reference/models/ullava.py:350-362`).
    """
    B, S1, H, hd = q.shape
    assert S1 == 1
    L, _, maxS, Ckv = cache_k.shape
    Hkv = Ckv // hd
    C = H * hd
    assert maxS % 8 == 0, "int8 KV cache length must be a sublane multiple"
    qs = q[:, 0]

    kv_spec = pl.BlockSpec(
        (1, 1, maxS, Ckv), lambda b, l_ref, wp_ref: (l_ref[0], b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sc_spec = pl.BlockSpec(
        (1, 1, maxS, Hkv), lambda b, l_ref, wp_ref: (l_ref[0], b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # Write windows are 8-row sublane stripes (Mosaic minimum); the block
    # index along maxS is in stripe units, so write_pos//8 addresses it.
    row_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, 8, w),
        lambda b, l_ref, wp_ref: (l_ref[0], b, wp_ref[b] // 8, 0),
        memory_space=pltpu.VMEM,
    )
    new_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, w), lambda b, l_ref, wp_ref: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, hd), lambda b, l_ref, wp_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            new_spec(Ckv),
            new_spec(Hkv),
            new_spec(Ckv),
            new_spec(Hkv),
            kv_spec,
            kv_spec,
            sc_spec,
            sc_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda b, l_ref, wp_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            row_spec(Ckv),
            row_spec(Ckv),
            row_spec(Hkv),
            row_spec(Hkv),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _fused_write_kernel, num_heads=H, num_kv_heads=Hkv,
            head_dim=hd, scale=scale
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), q.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ],
        # Flattened input indices INCLUDING the 2 scalar-prefetch operands:
        # 0=layer 1=write_pos 2=q 3=kq 4=ks 5=vq 6=vs
        # 7=cache_k 8=cache_v 9=k_scale 10=v_scale.
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1).astype(jnp.int32),
        write_pos.astype(jnp.int32),
        qs,
        kq_new.reshape(B, 1, Ckv),
        ks_new.reshape(B, 1, Hkv).astype(jnp.float32),
        vq_new.reshape(B, 1, Ckv),
        vs_new.reshape(B, 1, Hkv).astype(jnp.float32),
        cache_k,
        cache_v,
        k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
    )
    attn, ck, cv, cks, cvs = outs
    return attn.reshape(B, 1, H, hd), ck, cv, cks, cvs


def _prefill_qwrite_kernel(
    l_ref,  # [1] int32 scalar-prefetch: layer index (feeds output index maps)
    k_ref,  # [1, bs, C] compute dtype: new post-rope key rows (lanes merged)
    v_ref,  # [1, bs, C]
    ck_ref,  # aliased cache slabs — never read; declared so the outputs can
    cv_ref,  # alias them (pl.ANY memory space, no VMEM traffic)
    cks_ref,
    cvs_ref,
    ok_ref,  # [1, 1, bs, C] int8, aliased into cache_k at (layer, b, s, 0)
    ov_ref,  # [1, 1, bs, C] int8
    oks_ref,  # [1, 1, bs, H] f32
    ovs_ref,  # [1, 1, bs, H] f32
    *,
    num_heads: int,
    head_dim: int,
):
    # Quantize `bs` rows for one (batch, seq-chunk) and DMA them straight
    # into the stacked cache through aliased output windows. The math is
    # identical to quantize_kv_rows (f32 amax/127 scale, round, clip) so
    # prefill-written rows are bit-identical to the XLA path — but the f32
    # upcast, the scale broadcast, and the divide all live in VMEM, and the
    # cache write is the only HBM pass (the XLA chain materialized ~670 MB
    # of f32 intermediates per tensor per 7B/B=32 prefill, ~90 ms/batch).
    del ck_ref, cv_ref, cks_ref, cvs_ref, l_ref
    H, hd = num_heads, head_dim

    def quant(x_ref, oq_ref, os_ref):
        xf = x_ref[0].astype(jnp.float32)  # [bs, C]
        cols = []
        cols_e = []
        for h in range(H):
            seg = xf[:, h * hd:(h + 1) * hd]
            amax = jnp.maximum(
                jnp.max(jnp.abs(seg), axis=1, keepdims=True), 1e-12
            )  # [bs, 1]
            s = amax / 127.0
            cols.append(s)
            cols_e.append(jnp.broadcast_to(s, seg.shape))
        scale_e = jnp.concatenate(cols_e, axis=1)  # [bs, C]
        q = jnp.clip(jnp.round(xf / scale_e), -127, 127).astype(jnp.int8)
        oq_ref[0, 0] = q
        os_ref[0, 0] = jnp.concatenate(cols, axis=1)  # [bs, H]

    quant(k_ref, ok_ref, oks_ref)
    quant(v_ref, ov_ref, ovs_ref)


def prefill_quantize_write(
    k: jax.Array,  # [B, S, Hkv, hd] post-rope keys (compute dtype)
    v: jax.Array,  # [B, S, Hkv, hd]
    cache_k: jax.Array,  # [L, B, maxS, C] int8 — donated, returned updated
    cache_v: jax.Array,  # [L, B, maxS, C] int8
    k_scale: jax.Array,  # [L, B, maxS, Hkv] f32
    v_scale: jax.Array,  # [L, B, maxS, Hkv] f32
    layer_idx: jax.Array,  # [] int32
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Quantize a prefill's K/V rows and write positions [0, S) of one
    layer's cache in a single fused pass.

    Returns (cache_k', cache_v', k_scale', v_scale'); the cache operands
    are aliased in place under jit. Bit-identical rows to
    `quantize_kv_rows` + `dynamic_update_slice` (same f32 quantize math).

    Replaces the KV-cache population of the reference's HF `generate`
    prefill step (`/root/reference/models/ullava.py:350-362`).
    """
    B, S, Hkv, hd = k.shape
    C = Hkv * hd
    L, _, maxS, _ = cache_k.shape
    assert S % 8 == 0 and S <= maxS, (S, maxS)
    # Chunk the seq dim to bound VMEM (~20 MB at bs=256): largest
    # sublane-multiple divisor of S no bigger than 256.
    bs = next(
        (b for b in (256, 128, 64, 32, 16, 8) if S % b == 0), S
    )
    k2 = k.reshape(B, S, C)
    v2 = v.reshape(B, S, C)

    in_spec = pl.BlockSpec(
        (1, bs, C), lambda b, s, l_ref: (b, s, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_row = pl.BlockSpec(
        (1, 1, bs, C), lambda b, s, l_ref: (l_ref[0], b, s, 0),
        memory_space=pltpu.VMEM,
    )
    out_sc = pl.BlockSpec(
        (1, 1, bs, Hkv), lambda b, s, l_ref: (l_ref[0], b, s, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, S // bs),
        in_specs=[in_spec, in_spec, any_spec, any_spec, any_spec, any_spec],
        out_specs=[out_row, out_row, out_sc, out_sc],
    )
    outs = pl.pallas_call(
        functools.partial(
            _prefill_qwrite_kernel, num_heads=Hkv, head_dim=hd
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ],
        # Flattened inputs incl. scalar prefetch: 0=layer 1=k 2=v
        # 3=cache_k 4=cache_v 5=k_scale 6=v_scale.
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        layer_idx.reshape(1).astype(jnp.int32),
        k2,
        v2,
        cache_k,
        cache_v,
        k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
    )
    return tuple(outs)


def decode_attention_int8_xla(
    q, cache_k, cache_v, k_scale, v_scale, kv_lens, layer_idx, *, scale: float
) -> jax.Array:
    """Reference path: slice the layer, dequantize in XLA, and run plain
    attention. Used for kernel parity tests and non-TPU backends."""
    from ullava_tpu.ops.attention import attention_xla

    B, _, H, hd = q.shape
    maxS = cache_k.shape[2]
    # The cache's merged lane dim is Hkv*hd (GQA/MQA caches are smaller
    # than H*hd); derive Hkv from the scale tensor, not from q.
    Hkv = k_scale.shape[-1]
    kq = jax.lax.dynamic_index_in_dim(cache_k, layer_idx, 0, keepdims=False)
    vq = jax.lax.dynamic_index_in_dim(cache_v, layer_idx, 0, keepdims=False)
    ks = jax.lax.dynamic_index_in_dim(k_scale, layer_idx, 0, keepdims=False)
    vs = jax.lax.dynamic_index_in_dim(v_scale, layer_idx, 0, keepdims=False)
    k = (
        kq.reshape(B, maxS, Hkv, hd).astype(jnp.float32) * ks[..., None]
    ).astype(q.dtype)
    v = (
        vq.reshape(B, maxS, Hkv, hd).astype(jnp.float32) * vs[..., None]
    ).astype(q.dtype)
    return attention_xla(q, k, v, causal=False, kv_lens=kv_lens, scale=scale)
