"""Fused windowed attention with decomposed relative position bias.

The SAM ViT encoder's hot op (SURVEY.md §7.5): windowed self-attention
where scores get a decomposed rel-pos bias
  bias[(i,j),(a,b)] = q[(i,j)] . Rh[i-a+W-1] + q[(i,j)] . Rw[j-b+W-1].

The XLA path materializes the [S, S] bias per (window, head) in HBM
(~61 MB per ViT-H layer per image). These kernels instead take the bias
in its compact decomposed form — A[(i,j), a] and Bb[(i,j), b], W x
smaller — and expand it inside VMEM via one-hot MXU contractions
(column t = a*W + b, so A broadcasts over b and Bb tiles with period W),
fusing qk^T + bias + softmax + @v into one pass. Measured on v5e at
ViT-H shapes: 7.2x XLA for window blocks, 3.2x for global blocks.

Forward-only (the SAM encoder is frozen in every training stage); the
XLA path remains for CPU/tests and as the autodiff fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, a_ref, b_ref, oh_ref, o_ref, *, scale: float, window: int):
    # Blocks: q/k/v [NB, S, hd], a/b [NB, S, W], o [NB, S, hd]; S = window^2.
    # NB (window, head) pairs per program amortize launch overhead — the
    # per-pair workload (196 x 80) is tiny next to the grid dispatch cost.
    #
    # The decomposed bias is FOLDED INTO the qk contraction: since
    # bias[s, t=(a,b)] = A[s, a] + Bb[s, b], augmenting (in VMEM)
    #   q' = [q, A/scale, Bb/scale]
    #   k' = [k, onehot(t//W), onehot(t%W)]
    # gives q'.k' * scale = qk*scale + A + Bb in ONE K=(hd+2W)->128 dot —
    # the previous version issued three MXU-tile-padded dots (K=80 qk +
    # two K=14 one-hot expansions) and measured ~1.8x slower. The one-hot
    # lanes are exact in bf16; the bias rescale happens in fp32.
    W = window
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    S = q.shape[1]
    NB = q.shape[0]
    # a/b arrive pre-scaled by 1/scale (folded into the producing einsum
    # on the XLA side); oh is the [S, 2W] one-hot constant. All inputs
    # share one dtype so the VMEM concats involve no sub-lane casts
    # (Mosaic rejects f32->bf16 truncation on <128-lane vectors).
    qa = jnp.concatenate([q, a_ref[...], b_ref[...]], axis=-1)
    ka = jnp.concatenate(
        [k, jnp.broadcast_to(oh_ref[...][None], (NB, S, 2 * W))], axis=-1
    )

    s = jax.lax.dot_general(
        qa, ka, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [NB, S, S] fp32: qk^T * scale + bias, in one dot

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_window_attention(
    q: jax.Array,  # [N, S, hd]  (N = batch*windows*heads flattened)
    k: jax.Array,
    v: jax.Array,
    bias_a: jax.Array,  # [N, S, W]
    bias_b: jax.Array,  # [N, S, W]
    window: int,
    scale: float,
    n_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    N, S, hd = q.shape
    W = window
    assert S == W * W
    while n_block > 1 and N % n_block:
        n_block //= 2
    # Pre-scale the bias by 1/scale (fuses into the einsum that produced
    # it) and build the [S, 2W] one-hot constant once on the XLA side.
    inv = 1.0 / scale
    a_s = (bias_a.astype(jnp.float32) * inv).astype(q.dtype)
    b_s = (bias_b.astype(jnp.float32) * inv).astype(q.dtype)
    t = jnp.arange(S)
    oh = jnp.concatenate(
        [
            (t[:, None] // W == jnp.arange(W)[None]),
            (t[:, None] % W == jnp.arange(W)[None]),
        ],
        axis=-1,
    ).astype(q.dtype)  # [S, 2W]
    kernel = functools.partial(_kernel, scale=scale, window=window)
    spec3 = lambda d: pl.BlockSpec((n_block, S, d), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM)
    oh_spec = pl.BlockSpec((S, 2 * W), lambda n: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N // n_block,),
        in_specs=[spec3(hd), spec3(hd), spec3(hd), spec3(W), spec3(W), oh_spec],
        out_specs=spec3(hd),
        out_shape=jax.ShapeDtypeStruct((N, S, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, a_s, b_s, oh)


def _grid_kernel(
    y_ref, a_ref, b_ref, oh_ref, o_ref, *, num_heads: int, head_dim: int,
    scale: float, window: int, dots_i8: bool = False, real_tokens: int = 0,
):
    # y [nb, S, 3C] raw qkv projection output (column order (3, H, hd));
    # a/b [nb, S, H*W] bias terms in REVERSED column order (see
    # fused_window_attention_grid), pre-scaled by 1/scale — the matmul's
    # natural row-major layout, so no XLA-side transpose exists; the
    # per-head pick is a lane slice exactly like q/k/v;
    # oh [S, 2W] one-hot table matching that order; o [nb, S, C] merged.
    # All head slicing/merging happens on VMEM lanes — the HBM head-split
    # and merge transposes of the earlier pipeline don't exist.
    H, hd, W = num_heads, head_dim, window
    C = H * hd
    y = y_ref[...]
    a_all = a_ref[...]
    b_all = b_ref[...]
    nb, S, _ = y.shape
    oh = jnp.broadcast_to(oh_ref[...][None], (nb, S, 2 * W))
    # Padded window layout (tile-aligned rows): key columns beyond the
    # real token count are masked out; pad QUERY rows produce garbage
    # outputs that the caller discards at unpartition.
    key_mask = None
    if real_tokens and real_tokens < S:
        key_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) < real_tokens
        )
    for h in range(H):
        q = y[:, :, h * hd:(h + 1) * hd]
        k = y[:, :, C + h * hd:C + (h + 1) * hd]
        v = y[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        A = a_all[:, :, h * W:(h + 1) * W]
        Bb = b_all[:, :, h * W:(h + 1) * W]
        if dots_i8:
            # int8 x int8 score dots (see _global_y_kernel): per-row q/k
            # and bias-term quantization in VMEM; the one-hot table is
            # exact in int8; av stays bf16.
            qq, qs = _rq_rows(q)
            kq, ks = _rq_rows(k)
            abq, abss = _rq_rows(jnp.concatenate([A, Bb], axis=-1))
            s_qk = jax.lax.dot_general(
                qq, kq, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs * jnp.swapaxes(ks, 1, 2))
            s_b = jax.lax.dot_general(
                abq, oh_ref[...], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * abss
            s = (s_qk + s_b) * scale
        else:
            qa = jnp.concatenate([q, A, Bb], axis=-1)
            ka = jnp.concatenate([k, oh], axis=-1)
            s = jax.lax.dot_general(
                qa, ka, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
        if key_mask is not None:
            s = jnp.where(key_mask[None], s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def fused_window_attention_grid(
    y: jax.Array,  # [N, S, 3*H*hd] qkv projection output (bias included)
    bias_a: jax.Array,  # [N, S, H*W] col a' = bias for key row a=W-1-a'
    bias_b: jax.Array,  # [N, S, H*W] col b' = bias for key col b=W-1-b'
    num_heads: int,
    head_dim: int,
    window: int,
    scale: float,
    n_block: int = 8,  # 8 windows/program: ~8% faster than 4 (r5 sweep)
    dots_i8: bool = False,
    total_rows: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Grid-native windowed attention: consumes the raw [N, S, 3C] qkv
    matmul output and produces the head-merged [N, S, C] pre-proj output.

    The transpose-based pipeline spent ~9 ms/layer (ViT-H, B=16) on HBM
    copies: a [400,196,3840] layout change staging the head split, three
    [400,16,196,80] q/k/v transposes, bias-term merges, the [400,16,196,80]
    output transpose, and a final layout copy. Here the kernel reads y
    blocks whole, slices each head's 80 lanes in VMEM, and writes each
    head's output into its lane slot of the merged block — none of those
    copies exist.

    Bias terms arrive pre-scaled by 1/scale in [N, S, H*W] layout with
    REVERSED columns — the natural row-major output of the
    P-factorization (A[s, a] = P[s, i(s)+W-1-a], sliced per window row
    i), which replaces the i-batched einsum with one clean matmul; the
    reversal is absorbed by the one-hot column order here. See _kernel
    for the fold-into-the-dot trick.
    """
    N, S, _ = y.shape
    H, hd, W = num_heads, head_dim, window
    real = W * W
    # Padded layout (`total_rows` > W*W): tail rows are tile-alignment
    # pads — valid garbage as queries (outputs discarded by the caller),
    # masked out as keys inside the kernel.
    assert S == (total_rows or real) and S >= real, (S, total_rows)
    assert bias_a.shape == (N, S, H * W), bias_a.shape
    while n_block > 1 and N % n_block:
        n_block //= 2
    t = jnp.arange(S)
    # Reversed one-hots: bias column a' corresponds to key row W-1-a'.
    # Pad rows (t >= real) are masked in the kernel; their one-hot values
    # are irrelevant.
    oh = jnp.concatenate(
        [
            (t[:, None] // W == W - 1 - jnp.arange(W)[None]),
            (t[:, None] % W == W - 1 - jnp.arange(W)[None]),
        ],
        axis=-1,
    ).astype(jnp.int8 if dots_i8 else y.dtype)  # [S, 2W]
    kernel = functools.partial(
        _grid_kernel, num_heads=H, head_dim=hd, scale=scale, window=W,
        dots_i8=dots_i8, real_tokens=real if S > real else 0,
    )
    bias_spec = pl.BlockSpec(
        (n_block, S, H * W), lambda n: (n, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(N // n_block,),
        in_specs=[
            pl.BlockSpec((n_block, S, 3 * H * hd), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
            bias_spec,
            pl.BlockSpec((S, 2 * W), lambda n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_block, S, H * hd), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, H * hd), y.dtype),
        # The whole-y blocks exceed the default 16 MB scoped-VMEM budget
        # (~30 MB at ViT-H shapes with double buffering); v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(y, bias_a, bias_b, oh)


def _rect_kernel(
    y_ref, a_ref, b_ref, oh_ref, padk_ref, padv_ref, o_ref,
    *, num_heads: int, head_dim: int, scale: float, dots_i8: bool = False,
):
    # Boundary-window attention over COMPACT tokens with IMPLICIT pad keys.
    #
    # The reference (`image_encoder.py:263-318`) zero-pads the grid after
    # LN1, so every pad token's qkv input is exactly 0 and its key/value
    # are exactly the qkv bias slices (k_pad = bias_k, v_pad = bias_v) —
    # identical for all pad positions; only their rel-pos one-hots differ.
    # That makes the pad contribution reconstructible from a per-layer
    # constant table: padk [H, P, hd+2W] = [bias_k | onehot(row,col)],
    # padv [H, hd] = bias_v. The kernel appends the P virtual keys to each
    # window's real keys for the score dot; on the value side every pad
    # row is the SAME vector, so the pad output is just (pad probability
    # mass) * bias_v — a rank-1 VPU term, no v-side concat. Bit-for-bit
    # the reference's padded softmax, with no pad tokens in HBM and no
    # pad FLOPs in qkv/proj/MLP.
    #
    # y [nb, T, 3C] raw qkv output of the T = rows*cols REAL tokens
    # (row-major over the window's real rectangle); a/b [nb, T, H*W]
    # reversed-column bias terms pre-scaled by 1/scale (natural row-major
    # layout, per-head pick = lane slice); oh [T, 2W] the real tokens'
    # one-hot table.
    H, hd = num_heads, head_dim
    C = H * hd
    y = y_ref[...]
    a_all = a_ref[...]
    b_all = b_ref[...]
    nb, T, _ = y.shape
    W = a_all.shape[-1] // H
    # Dual-geometry mode: tables arrive as [1, ...] blocks of a stacked
    # [halves, ...] array, selected per program by the BlockSpec index
    # maps (right/bottom boundary classes share one kernel launch).
    oh_t = oh_ref[...]
    if oh_t.ndim == 3:
        oh_t = oh_t[0]
    padk = padk_ref[...]
    if padk.ndim == 4:
        padk = padk[0]
    padv = padv_ref[...]
    if padv.ndim == 3:
        padv = padv[0]
    P = padk.shape[1]
    oh = jnp.broadcast_to(oh_t[None], (nb, T, oh_t.shape[-1]))
    for h in range(H):
        q = y[:, :, h * hd:(h + 1) * hd]
        k = y[:, :, C + h * hd:C + (h + 1) * hd]
        v = y[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        A_h = a_all[:, :, h * W:(h + 1) * W]
        B_h = b_all[:, :, h * W:(h + 1) * W]
        qa = jnp.concatenate([q, A_h, B_h], axis=-1)
        if dots_i8:
            # int8 x int8 score dots over the REAL keys (see
            # _global_y_kernel); the tiny pad-key dot (P <= W^2 - T
            # columns) stays bf16 against the constant pad table.
            qq, qs = _rq_rows(q)
            kq, ks = _rq_rows(k)
            abq, abss = _rq_rows(jnp.concatenate([A_h, B_h], axis=-1))
            s_real = jax.lax.dot_general(
                qq, kq, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs * jnp.swapaxes(ks, 1, 2))
            s_real = s_real + jax.lax.dot_general(
                abq, oh_t, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * abss
            s_pad = jax.lax.dot_general(
                qa, padk[h], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.concatenate([s_real, s_pad], axis=-1) * scale
        else:
            ka = jnp.concatenate([k, oh], axis=-1)  # [nb, T, hd+2W]
            pk = jnp.broadcast_to(padk[h][None], (nb, P, ka.shape[-1]))
            ka = jnp.concatenate([ka, pk], axis=1)  # [nb, T+P, hd+2W]
            s = jax.lax.dot_general(
                qa, ka, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [nb, T, T+P]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p[:, :, :T].astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # All pad values are the same bias_v vector: rank-1 correction.
        pad_mass = jnp.sum(p[:, :, T:], axis=-1, keepdims=True)  # [nb, T, 1]
        o = o + pad_mass * padv[h].astype(jnp.float32)[None, None, :]
        o_ref[:, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def fused_window_attention_rect(
    y: jax.Array,  # [N, T, 3*H*hd] qkv output, T = rows*cols real tokens
    bias_a: jax.Array,  # [N, T, H*W] pre-scaled, reversed columns
    bias_b: jax.Array,
    oh: jax.Array,  # [T, 2W] real-token one-hots (reversed columns)
    pad_k: jax.Array,  # [H, P, hd+2W] virtual pad-key annotations
    pad_v: jax.Array,  # [H, hd] virtual pad value (bias_v, shared by pads)
    num_heads: int,
    head_dim: int,
    window: int,
    scale: float,
    n_block: int = 8,  # 8 windows/program (matches the r5 grid sweep)
    dots_i8: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Windowed attention for BOUNDARY windows of the pad-free resident
    layout (`image_encoder._partition_resident`): real tokens only, with
    the reference's zero-pad keys reconstructed inside the kernel from the
    per-layer qkv-bias table. See `_rect_kernel`."""
    N, T, _ = y.shape
    H, hd, W = num_heads, head_dim, window
    assert bias_a.shape == (N, T, H * W), bias_a.shape
    # Dual-geometry mode: `oh`/`pad_k`/`pad_v` arrive stacked with a
    # leading halves axis (right+bottom boundary classes in one launch);
    # the index maps route each program its half's tables, so the
    # XLA-side split of the merged qkv output never materializes.
    halves = oh.shape[0] if oh.ndim == 3 else 0
    if halves:
        assert N % halves == 0, (N, halves)
    while n_block > 1 and (
        N % n_block or (halves and (N // halves) % n_block)
    ):
        n_block //= 2
    per_half = (N // n_block) // halves if halves else 0
    if dots_i8:
        oh = oh.astype(jnp.int8)  # exact: one-hot values are 0/1
    kernel = functools.partial(
        _rect_kernel, num_heads=H, head_dim=hd, scale=scale, dots_i8=dots_i8
    )
    bias_spec = pl.BlockSpec(
        (n_block, T, H * W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM
    )
    if halves:
        table = lambda a: pl.BlockSpec(  # noqa: E731
            (1,) + a.shape[1:],
            lambda n: (n // per_half,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM,
        )
    else:
        table = lambda a: pl.BlockSpec(  # noqa: E731
            a.shape, lambda n: (0,) * a.ndim, memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=(N // n_block,),
        in_specs=[
            pl.BlockSpec((n_block, T, 3 * H * hd), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
            bias_spec,
            table(oh),
            table(pad_k),
            table(pad_v),
        ],
        out_specs=pl.BlockSpec((n_block, T, H * hd), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, H * hd), y.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(y, bias_a, bias_b, oh, pad_k, pad_v)


def _tiled_kernel(
    q_ref, k_ref, v_ref, a_ref, b_ref, oh_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, scale: float, window: int, block_q: int, block_k: int,
    exp_bf16: bool = False,
):
    """Flash-style online-softmax attention with decomposed rel-pos bias
    (for the SAM global blocks: S = window^2 = 4096, whose full [S, S]
    scores neither fit VMEM nor should touch HBM). As in `_kernel`, the
    bias folds into the score contraction: q' = [q, A/scale, Bb/scale]
    against k' = [k, onehot(t//W), onehot(t%W)] — one K=208->256 dot
    instead of three 128-padded ones (qk + two one-hot expansions)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # a/b pre-scaled by 1/scale on the XLA side; oh is the k-tile's slice
    # of the [S, 2W] one-hot table (no in-kernel sub-lane bool casts).
    qa = jnp.concatenate([q, a_ref[0], b_ref[0]], axis=-1)
    ka = jnp.concatenate([k, oh_ref[...]], axis=-1)

    s = jax.lax.dot_general(
        qa, ka, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK] fp32: qk*scale + bias in one dot

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    if exp_bf16:
        # Serving mode: the [BQ, BK] exp runs on bf16 (the VPU packs two
        # bf16 lanes per fp32 op) — this exp over S^2 = 16.7M scores per
        # (image, head) is the kernel's floor, not the MXU dots. The
        # running max/sum statistics stay fp32; p was cast to v.dtype for
        # the av dot anyway, so only the probability mantissa (~2^-8
        # relative) is affected — below the int8-weight serving noise.
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
        p_sum = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        p = jnp.exp(s - m_new)
        p_sum = jnp.sum(p, axis=-1, keepdims=True)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[...] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + p_sum, l_ref.shape
    )
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def fused_global_attention(
    q: jax.Array,  # [N, S, hd], S = window^2 (e.g. 4096 for ViT-H)
    k: jax.Array,
    v: jax.Array,
    bias_a: jax.Array,  # [N, S, W]
    bias_b: jax.Array,
    window: int,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
    exp_bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Block sizes: 1024x1024 measured 1.4x faster than 512x512 on v5e at
    ViT-H serving shapes (fewer program launches, larger MXU dots); the
    fp32 score tile is 4 MB, well inside VMEM. exp_bf16 runs the softmax
    exp in bf16 (serving mode, see _tiled_kernel)."""
    N, S, hd = q.shape
    W = window
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    inv = 1.0 / scale
    a_s = (bias_a.astype(jnp.float32) * inv).astype(q.dtype)
    b_s = (bias_b.astype(jnp.float32) * inv).astype(q.dtype)
    t = jnp.arange(S)
    oh = jnp.concatenate(
        [
            (t[:, None] // W == jnp.arange(W)[None]),
            (t[:, None] % W == jnp.arange(W)[None]),
        ],
        axis=-1,
    ).astype(q.dtype)  # [S, 2W] one-hot table, blocked by k-tile
    kernel = functools.partial(
        _tiled_kernel, scale=scale, window=window,
        block_q=block_q, block_k=block_k, exp_bf16=exp_bf16,
    )
    qspec = pl.BlockSpec((1, block_q, hd), lambda n, iq, ik: (n, iq, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, block_k, hd), lambda n, iq, ik: (n, ik, 0),
                         memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((1, block_q, window), lambda n, iq, ik: (n, iq, 0),
                         memory_space=pltpu.VMEM)
    ohspec = pl.BlockSpec((block_k, 2 * W), lambda n, iq, ik: (ik, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N, pl.cdiv(S, block_q), pl.cdiv(S, block_k)),
        in_specs=[qspec, kspec, kspec, aspec, aspec, ohspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((N, S, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v, a_s, b_s, oh)


def _rq_rows(x: jax.Array):
    """Per-row symmetric int8 quantization in VMEM (f32 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    q = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    return q, amax * (1.0 / 127.0)


def _global_y_kernel(
    yq_ref, yk_ref, yv_ref, a_ref, b_ref, oh_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, scale: float, head_group: int, head_dim: int, exp_bf16: bool,
    dots_i8: bool = False,
):
    """Per-program: `head_group` heads of one (batch, q-tile, k-tile) cell,
    q/k/v read as 128-aligned lane slices of the raw qkv output y —
    see `fused_global_attention_y`."""
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    hg, hd = head_group, head_dim

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    oh = oh_ref[...]  # [BK, 2W]
    W = oh.shape[-1] // 2
    for h in range(hg):
        q = yq_ref[0, :, h * hd:(h + 1) * hd]
        k = yk_ref[0, :, h * hd:(h + 1) * hd]
        v = yv_ref[0, :, h * hd:(h + 1) * hd]
        # Bias terms arrive pre-scaled by 1/scale (folded into the RhG/RwG
        # constants on the XLA side), so one augmented dot yields
        # qk*scale + bias exactly as in `_tiled_kernel`. Per-head bias is a
        # plain lane slice (Mosaic rejects middle-dim slices in concats).
        if dots_i8:
            # int8 x int8 score dots (serving): q/k rows and the bias-term
            # rows quantize per-row in VMEM (the one-hot table is exact in
            # int8), so the qk and bias-expansion dots run at the MXU's
            # 2x int8 rate. Scales dequantize on the [BQ, BK] tile: per-row
            # q scale broadcasts down columns, per-key k scale broadcasts
            # across rows (one [BK,1]->[1,BK] VMEM transpose). The av dot
            # stays bf16: probabilities are too diffuse for int8.
            qq, qs = _rq_rows(q)
            kq, ks = _rq_rows(k)
            ab = jnp.concatenate(
                [a_ref[0, :, h * W:(h + 1) * W],
                 b_ref[0, :, h * W:(h + 1) * W]],
                axis=-1,
            )
            abq, abss = _rq_rows(ab)
            s_qk = jax.lax.dot_general(
                qq, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (qs * jnp.transpose(ks))
            s_b = jax.lax.dot_general(
                abq, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * abss
            s = (s_qk + s_b) * scale
        else:
            qa = jnp.concatenate(
                [q, a_ref[0, :, h * W:(h + 1) * W],
                 b_ref[0, :, h * W:(h + 1) * W]],
                axis=-1,
            )
            ka = jnp.concatenate([k, oh], axis=-1)
            s = jax.lax.dot_general(
                qa, ka, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

        m_prev = m_ref[h, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        if exp_bf16:
            p = jnp.exp((s - m_new).astype(jnp.bfloat16))
            p_sum = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            p = jnp.exp(s - m_new)
            p_sum = jnp.sum(p, axis=-1, keepdims=True)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[h] = jnp.broadcast_to(
            alpha * l_ref[h, :, :1] + p_sum, l_ref[h].shape
        )
        acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        for h in range(hg):
            o_ref[0, :, h * hd:(h + 1) * hd] = (
                acc_ref[h] / l_ref[h, :, :1]
            ).astype(o_ref.dtype)


def fused_global_attention_y(
    y: jax.Array,  # [B, S, 3C] raw qkv projection output (bias included)
    bias_a: jax.Array,  # [B, S, H, W] pre-scaled by 1/scale, y.dtype
    bias_b: jax.Array,  # [B, S, H, W]
    num_heads: int,
    head_dim: int,
    window: int,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
    head_group: int = 0,
    exp_bf16: bool = False,
    dots_i8: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Global-block attention that consumes the fused LN+qkv kernel's raw
    [B, S, 3C] output directly and emits the head-merged [B, S, C] pre-proj
    activations.

    The `fused_global_attention` pipeline staged q/k/v through HBM
    relayouts first — a [B,S,3,H,hd] reshape, the [B,H,S,hd] head-major
    transposes, and a post-attention merge transpose, ~19 ms per ViT-H
    B=48 global block. Here each program reads q/k/v of a `head_group`
    head slab as one 128-aligned lane slice of y (hg*hd must be a
    multiple of 128: 8 heads x 80 = 640 lanes for ViT-H), and the bias
    terms are taken in their natural einsum layout [B, S, H, W] — no
    pre-scale pass and no head-leading transpose exist either.

    Reference computation: `/root/reference/models/segment_anything/
    modeling/image_encoder.py:163-185` (Block.forward, window_size == 0)
    + `:321-393` (decomposed rel-pos bias)."""
    B, S, threeC = y.shape
    H, hd, W = num_heads, head_dim, window
    C = H * hd
    assert threeC == 3 * C and S == W * W
    assert bias_a.shape == (B, S, H, W), bias_a.shape
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    if head_group <= 0:
        head_group = 1
        for hg in (16, 8, 4, 2):
            if H % hg == 0 and (hg * hd) % 128 == 0 and hg * hd <= 1280:
                head_group = hg
                break
    hg = head_group
    assert H % hg == 0 and (hg * hd) % 128 == 0, (H, hg, hd)
    G = H // hg

    t = jnp.arange(S)
    oh = jnp.concatenate(
        [
            (t[:, None] // W == jnp.arange(W)[None]),
            (t[:, None] % W == jnp.arange(W)[None]),
        ],
        axis=-1,
    ).astype(jnp.int8 if dots_i8 else y.dtype)  # [S, 2W]

    kernel = functools.partial(
        _global_y_kernel, scale=scale, head_group=hg, head_dim=hd,
        exp_bf16=exp_bf16, dots_i8=dots_i8,
    )
    lanes = hg * hd

    def y_spec(section):  # 0=q 1=k 2=v; lane-block index = section*G + g
        if section == 0:
            return pl.BlockSpec(
                (1, block_q, lanes),
                lambda b, g, iq, ik: (b, iq, g),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, block_k, lanes),
            lambda b, g, iq, ik, s=section: (b, ik, s * G + g),
            memory_space=pltpu.VMEM,
        )

    bias_spec = pl.BlockSpec(
        (1, block_q, hg * W), lambda b, g, iq, ik: (b, iq, g),
        memory_space=pltpu.VMEM,
    )
    a_l = bias_a.reshape(B, S, H * W)  # free: contiguous lane merge
    b_l = bias_b.reshape(B, S, H * W)
    return pl.pallas_call(
        kernel,
        grid=(B, G, pl.cdiv(S, block_q), pl.cdiv(S, block_k)),
        in_specs=[
            y_spec(0), y_spec(1), y_spec(2), bias_spec, bias_spec,
            pl.BlockSpec((block_k, 2 * W), lambda b, g, iq, ik: (ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, lanes), lambda b, g, iq, ik: (b, iq, g),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, C), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((hg, block_q, 128), jnp.float32),
            pltpu.VMEM((hg, block_q, 128), jnp.float32),
            pltpu.VMEM((hg, block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(y, y, y, a_l, b_l, oh)


def decomposed_bias_terms(
    q_grid: jax.Array,  # [B, H, W, W, hd] (query positions on the grid)
    rel_pos_h: jax.Array,  # [2W-1, hd]
    rel_pos_w: jax.Array,
    window: int,
):
    """Compact bias terms: A[b,h,(i,j),a] and Bb[b,h,(i,j),b]."""
    coords = jnp.arange(window)
    rel = coords[:, None] - coords[None, :] + (window - 1)  # [W, W]
    RhG = rel_pos_h[rel]  # [i, a, hd]
    RwG = rel_pos_w[rel]  # [j, b, hd]
    qf = q_grid.astype(jnp.float32)
    A = jnp.einsum("nhijc,iac->nhija", qf, RhG.astype(jnp.float32))
    Bb = jnp.einsum("nhijc,jbc->nhijb", qf, RwG.astype(jnp.float32))
    B, H = q_grid.shape[:2]
    S = window * window
    return A.reshape(B, H, S, window), Bb.reshape(B, H, S, window)


# ---------------------------------------------------------------------------
# Packed head-major layout (serving): qkv weights are pre-reordered to
# [C, 3, H, hp] with the head dim zero-padded to hp=128 lanes
# (`image_encoder.pack_sam_attention`). The kernels then read each head's
# q/k/v directly as a 128-aligned lane block of the projection output —
# no [B,S,3,H,hd] reshape, head split, or [B,H,S,hd] transpose copies ever
# materialize in HBM (those copies were ~25% of SAM ViT-H encode time).
# Zero pad lanes are exact: they contribute nothing to q.k contractions,
# and pad columns of the attention output hit zero rows of the packed
# projection weight.
# ---------------------------------------------------------------------------


def _packed_window_kernel(
    q_ref, k_ref, v_ref, a_ref, b_ref, o_ref, *, scale: float, window: int
):
    # Blocks: q/k/v/o [NB, S, hp]; a/b [NB, 1, S, W].
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    A = a_ref[:, 0]
    Bb = b_ref[:, 0]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale

    S = q.shape[1]
    col_t = jax.lax.broadcasted_iota(jnp.int32, (window, S), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (window, S), 0)
    eh = (col_t // window == row).astype(A.dtype)
    ew = (col_t % window == row).astype(A.dtype)
    s = s + jax.lax.dot_general(
        A, eh, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + jax.lax.dot_general(
        Bb, ew, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_window_attention_packed(
    y: jax.Array,  # [N, S, 3*H*hp] packed qkv projection output
    bias_a: jax.Array,  # [N, H, S, W]
    bias_b: jax.Array,  # [N, H, S, W]
    num_heads: int,
    head_pad: int,
    window: int,
    scale: float,
    n_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Returns [N, S, H*hp] head-major attention output."""
    N, S, _ = y.shape
    H, hp = num_heads, head_pad
    assert S == window * window
    while n_block > 1 and N % n_block:
        n_block //= 2
    kernel = functools.partial(_packed_window_kernel, scale=scale, window=window)

    def qkv_spec(part):  # part: 0=q 1=k 2=v; lane-block index = part*H + h
        return pl.BlockSpec(
            (n_block, S, hp), lambda n, h, p=part: (n, 0, p * H + h),
            memory_space=pltpu.VMEM,
        )

    bias_spec = pl.BlockSpec(
        (n_block, 1, S, window), lambda n, h: (n, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(N // n_block, H),
        in_specs=[qkv_spec(0), qkv_spec(1), qkv_spec(2), bias_spec, bias_spec],
        out_specs=pl.BlockSpec(
            (n_block, S, hp), lambda n, h: (n, 0, h), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, S, H * hp), y.dtype),
        interpret=interpret,
    )(y, y, y, bias_a, bias_b)


def _packed_global_kernel(
    q_ref, k_ref, v_ref, a_ref, b_ref, o_ref,
    m_ref, l_ref, acc_ref,
    *, scale: float, window: int, block_k: int,
):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    A = a_ref[0, 0]
    Bb = b_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    t = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (window, block_k), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (window, block_k), 0)
    eh = (t // window == r).astype(A.dtype)
    ew = (t % window == r).astype(A.dtype)
    s = s + jax.lax.dot_general(
        A, eh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + jax.lax.dot_general(
        Bb, ew, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[...] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
    )
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def fused_global_attention_packed(
    y: jax.Array,  # [B, S, 3*H*hp]
    bias_a: jax.Array,  # [B, H, S, W]
    bias_b: jax.Array,  # [B, H, S, W]
    num_heads: int,
    head_pad: int,
    window: int,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    B, S, _ = y.shape
    H, hp = num_heads, head_pad
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    kernel = functools.partial(
        _packed_global_kernel, scale=scale, window=window, block_k=block_k
    )

    def qkv_spec(part, blk):
        if blk == "q":
            return pl.BlockSpec(
                (1, block_q, hp), lambda b, h, iq, ik, p=part: (b, iq, p * H + h),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1, block_k, hp), lambda b, h, iq, ik, p=part: (b, ik, p * H + h),
            memory_space=pltpu.VMEM,
        )

    bias_spec = pl.BlockSpec(
        (1, 1, block_q, window), lambda b, h, iq, ik: (b, h, iq, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H, pl.cdiv(S, block_q), pl.cdiv(S, block_k)),
        in_specs=[qkv_spec(0, "q"), qkv_spec(1, "k"), qkv_spec(2, "k"),
                  bias_spec, bias_spec],
        out_specs=pl.BlockSpec(
            (1, block_q, hp), lambda b, h, iq, ik: (b, iq, h),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, H * hp), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, hp), jnp.float32),
        ],
        interpret=interpret,
    )(y, y, y, bias_a, bias_b)
