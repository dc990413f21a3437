"""Fused transformer-MLP Pallas kernel for the frozen SAM/CLIP towers.

Replaces the XLA lowering of `x + fc2(gelu(fc1(LN(x))))` on the serving
path (reference computation: `/root/reference/models/segment_anything/
modeling/image_encoder.py` Block.mlp + MLPBlock). The XLA version runs as
several fusions with real HBM round-trips: the [T, F] GELU intermediate
(F = 4C = 5120 for ViT-H) is written and re-read (~800 MB at the B=16
serving point), the LayerNorm materializes fp32 temporaries, and the two
dots carry batched-window shapes with poor MXU tiling. This kernel does
LN -> fc1 -> GELU -> fc2 -> +residual in one pass:

- grid (token tiles, F chunks); the F-chunk loop accumulates fc2 partial
  sums in a VMEM fp32 scratch, so the GELU intermediate never leaves VMEM;
- int8 weights stream chunk-by-chunk and dequantize in VMEM (per-output-
  channel scales, matching `ops/quant.quantize_int8`);
- LN statistics in fp32 (same recipe as `ops/norms.layer_norm`), computed
  once per token tile on the first F chunk;
- forward-only: the towers it serves are frozen in every training stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Chebyshev-fit power series for erf(t)/t in u = t^2 on [0, 3.0^2], with
# hard saturation to sign(t) past the clamp (1 - erf(3.0) = 2.2e-5). Max
# |gelu err| vs exact erf: 8.2e-4 absolute / 2.1e-5 for |x| < 1 — both
# below bf16 output resolution at the corresponding magnitudes. (A
# degree-12 fit reaching 2.8e-6 measured ~20% of the fused-MLP kernel's
# VPU time; the extra precision is invisible in bf16.)
_ERF_CLAMP = 3.0
_ERF_COEF = (
    1.128298328383344, -0.37489969643977966, 0.10971839155099318,
    -0.023743737062092228, 0.0036059320467746367, -0.0003563589626086337,
    2.0252568341883032e-05, -4.971512367804531e-07,
)


def _erf(x: jax.Array) -> jax.Array:
    """Polynomial erf: t*P(t^2), degree-7 Chebyshev fit in t^2, saturated
    to +-1 beyond the clamp.

    Mosaic has no erf lowering, and a rational approximation (A&S 7.1.26)
    needs an exp AND a reciprocal per element — ~40% of the whole
    fused-MLP kernel's time on the VPU. Pure FMAs instead: 7-step Horner,
    no transcendentals."""
    a = jnp.abs(x)
    t = jnp.minimum(a, _ERF_CLAMP)
    u = t * t
    p = jnp.full_like(u, _ERF_COEF[-1])
    for c in _ERF_COEF[-2::-1]:
        p = p * u + c
    e = jnp.where(a > _ERF_CLAMP, jnp.ones_like(t), t * p)
    return jnp.sign(x) * e


def _gelu_exact(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def _row_quant(x: jax.Array):
    """Per-row symmetric int8 dynamic quantization (f32 math: Mosaic has
    no bf16 roundeven, so bf16 inputs convert first)."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.round(x * (127.0 / jnp.maximum(amax, 1e-12))).astype(jnp.int8)
    return xq, xs


def _kernel(
    x_ref, ln_s_ref, ln_b_ref,
    w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref,
    o_ref,
    xn_ref, xs_ref, acc_ref,
    *, eps: float, n_chunks: int, w8a8: bool,
):
    k = pl.program_id(1)
    h_dtype = o_ref.dtype

    def _flat(v):
        # 3-D window blocks ([wb, T, C], T not tile-aligned) flatten to
        # [wb*T, C] in VMEM so the dots run one tall matmul instead of wb
        # starved batched ones — and the HBM flat-reshape copy pair the
        # XLA path needs for non-aligned T never exists.
        return v.reshape(-1, v.shape[-1]) if v.ndim == 3 else v

    @pl.when(k == 0)
    def _prologue():
        xf = _flat(x_ref[...]).astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) * jax.lax.rsqrt(var + eps)
        normed = normed * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(
            jnp.float32
        )
        if w8a8:
            xq, xs = _row_quant(normed)
            xn_ref[...] = xq
            xs_ref[...] = jnp.broadcast_to(xs, xs_ref.shape)
        else:
            xn_ref[...] = normed.astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xn = xn_ref[...]
    if w8a8:
        # int8 x int8 on the MXU (~1.6x the bf16 rate measured on v5e);
        # activations are per-row dynamically quantized, weights carry
        # per-output-channel scales.
        h = jax.lax.dot_general(
            xn, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        h = h * (xs_ref[:, :1] * s1_ref[...]) + b1_ref[...].astype(jnp.float32)
    else:
        w1 = w1_ref[...].astype(xn.dtype)  # int8 -> bf16 in VMEM
        h = jax.lax.dot_general(
            xn, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        h = h * s1_ref[...] + b1_ref[...].astype(jnp.float32)
    # exact-GELU parity with the reference (see _erf). A bf16-polynomial
    # variant was tried in round 5 and removed: measured SLOWER on v5e
    # (Mosaic bf16 lowering) AND numerically broken (bf16 Horner
    # cancellation at the erf clamp, max abs err ~1.5).
    h = _gelu_exact(h)
    if w8a8:
        # Per-row h quantization costs ~3.5 us/program (the lane-dim amax
        # reduce dominates), but a bf16 fc2 measured WORSE (+2 ms/block):
        # the int8->bf16 weight dequant pass plus the 2x-slower bf16 dot
        # exceed the quant cost. int8 x int8 fc2 stays.
        hq, hs = _row_quant(h)
        acc_ref[...] += jax.lax.dot_general(
            hq, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (hs * s2_ref[...])
    else:
        w2 = w2_ref[...].astype(h_dtype)
        acc_ref[...] += jax.lax.dot_general(
            h.astype(h_dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s2_ref[...]

    @pl.when(k == n_chunks - 1)
    def _epilogue():
        out = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        out = out + _flat(x_ref[...]).astype(jnp.float32)
        o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def fused_mlp_block(
    x: jax.Array,  # [T, C] residual-stream input (bf16)
    ln_scale: jax.Array,  # [C]
    ln_bias: jax.Array,  # [C]
    w1_q: jax.Array,  # [C, F] int8
    w1_scale: jax.Array,  # [1, F] f32
    b1: jax.Array,  # [F]
    w2_q: jax.Array,  # [F, C] int8
    w2_scale: jax.Array,  # [1, C] f32
    b2: jax.Array,  # [C]
    eps: float,
    block_t: int = 0,
    f_chunk: int = 0,
    w8a8: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x + fc2(gelu(fc1(LN(x)))), one fused pass. T % block_t == 0 and
    F % f_chunk == 0 are required (serving shapes satisfy both; callers
    fall back to the XLA path otherwise). With w8a8=True both dots run
    int8 x int8 on the MXU (fc1 activations quantized once per token tile
    in the prologue; the GELU output re-quantized per chunk — measured
    cheaper than a bf16 fc2, see the kernel comment). block_t/f_chunk
    of 0 pick the largest aligned tile (1024 when divisible, else 512) —
    1024/1024 measured ~6% faster than 512/512 at the ViT-H shapes.

    A layout-preserving 3-D window form ([N, 196, C] per the resident
    classes) was built and measured NET-NEGATIVE twice with BATCHED dots:
    round 2's per-window dot chains (SAM phase 2.11 -> 2.17 s, strided
    block DMAs), and round 4's wb-batched variant (dots batched over wb:
    32.5/35.2 ms at wb=4/8 vs 25.1 ms for flat-reshape + this kernel at
    [768,196,1280]x5120 — batched M=196 dots starve the MXU more than the
    196->200-row-tile relayout copies cost). The 3-D form accepted HERE is
    different: blocks arrive [wb, T, C] but flatten to [wb*T, C] in VMEM
    (`_flat`), so the dots are the same tall matmuls as the 2-D form while
    the XLA-side flat-reshape HBM copy pair (~67 ms per ViT-H B=48 encode)
    disappears."""
    F = w1_q.shape[1]
    f_chunk = f_chunk or (1024 if F % 1024 == 0 else 512)
    assert F % f_chunk == 0, F
    n_chunks = F // f_chunk
    kernel = functools.partial(
        _kernel, eps=eps, n_chunks=n_chunks, w8a8=w8a8
    )

    if x.ndim == 3:
        N, T, C = x.shape
        wb = 1
        while wb < N and wb * T < 1024 and N % (wb * 2) == 0:
            wb *= 2
        rows = wb * T
        grid = (N // wb, n_chunks)
        tok_spec = pl.BlockSpec(
            (wb, T, C), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((N, T, C), x.dtype)
    else:
        T, C = x.shape
        block_t = block_t or (1024 if T % 1024 == 0 else 512)
        assert T % block_t == 0, T
        rows = block_t
        grid = (T // block_t, n_chunks)
        tok_spec = pl.BlockSpec(
            (block_t, C), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((T, C), x.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tok_spec,
            pl.BlockSpec((1, C), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, f_chunk), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_chunk), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_chunk), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_chunk, C), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tok_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, C), jnp.int8 if w8a8 else x.dtype),
            pltpu.VMEM((rows, 128), jnp.float32),  # per-row act scales
            pltpu.VMEM((rows, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        w1_q, w1_scale.reshape(1, F).astype(jnp.float32), b1.reshape(1, F),
        w2_q, w2_scale.reshape(1, C).astype(jnp.float32), b2.reshape(1, C),
    )
    return out


def _kernel_v2(
    x_ref, ln_s_ref, ln_b_ref,
    w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref,
    o_ref,
    xn_ref, xs_ref, acc_ref, h_ref,
    *, eps: float, n_chunks: int,
):
    """Chunk-pipelined w8a8 variant of `_kernel`: grid step k issues the
    fc1 dot for chunk k (MXU, raw int32 into a parity-double-buffered
    scratch) BEFORE running the GELU+requant epilogue of chunk k-1 (VPU)
    and its fc2 dot. The VPU epilogue is ~40% of a chunk's serial time in
    `_kernel` (the MXU sits idle through it); here it has an independent
    in-flight fc1 dot to hide behind. Grid is (T/bt, n_chunks + 1): step 0
    only produces, step n_chunks only consumes. Per-chunk math is bitwise
    identical to `_kernel` (same quant granularity, same fp32 dequant)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) * jax.lax.rsqrt(var + eps)
        normed = normed * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[
            ...
        ].astype(jnp.float32)
        xq, xs = _row_quant(normed)
        xn_ref[...] = xq
        xs_ref[...] = jnp.broadcast_to(xs, xs_ref.shape)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(k < n_chunks)
    def _produce():
        h_ref[k % 2] = jax.lax.dot_general(
            xn_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when(k > 0)
    def _consume():
        # s1/b1/w2/s2 blocks carry chunk k-1 here (see the index maps).
        h = h_ref[(k - 1) % 2].astype(jnp.float32)
        h = h * (xs_ref[:, :1] * s1_ref[...]) + b1_ref[...].astype(jnp.float32)
        h = _gelu_exact(h)
        hq, hs = _row_quant(h)
        acc_ref[...] += jax.lax.dot_general(
            hq, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (hs * s2_ref[...])

    @pl.when(k == n_chunks)
    def _epilogue():
        out = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        o_ref[...] = (out + x_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_mlp_block_v2(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1_q: jax.Array,
    w1_scale: jax.Array,
    b1: jax.Array,
    w2_q: jax.Array,
    w2_scale: jax.Array,
    b2: jax.Array,
    eps: float,
    block_t: int = 0,
    f_chunk: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """`fused_mlp_block` (w8a8 only) with the fc1 MXU dot of chunk k
    software-pipelined against the GELU+requant VPU epilogue of chunk
    k-1. Output is bitwise-equal to `fused_mlp_block(w8a8=True)` at the
    same (block_t, f_chunk)."""
    T, C = x.shape
    F = w1_q.shape[1]
    block_t = block_t or (1024 if T % 1024 == 0 else 512)
    f_chunk = f_chunk or (1024 if F % 1024 == 0 else 512)
    assert T % block_t == 0 and F % f_chunk == 0, (T, F)
    n = F // f_chunk
    kernel = functools.partial(_kernel_v2, eps=eps, n_chunks=n)
    last = lambda i, k: (0, 0)
    w1_map = lambda i, k: (0, jnp.minimum(k, n - 1))
    c1_map = lambda i, k: (0, jnp.maximum(k - 1, 0))  # s1/b1 at chunk k-1
    w2_map = lambda i, k: (jnp.maximum(k - 1, 0), 0)
    out = pl.pallas_call(
        kernel,
        grid=(T // block_t, n + 1),
        in_specs=[
            pl.BlockSpec((block_t, C), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), last, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, f_chunk), w1_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_chunk), c1_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_chunk), c1_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((f_chunk, C), w2_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), last, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, C), lambda i, k: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_t, C), jnp.int8),
            pltpu.VMEM((block_t, 128), jnp.float32),
            pltpu.VMEM((block_t, C), jnp.float32),
            pltpu.VMEM((2, block_t, f_chunk), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        w1_q, w1_scale.reshape(1, F).astype(jnp.float32), b1.reshape(1, F),
        w2_q, w2_scale.reshape(1, C).astype(jnp.float32), b2.reshape(1, C),
    )
    return out


def _silu_mul_quant_kernel(g_ref, u_ref, q_ref, s_ref):
    gf = g_ref[...].astype(jnp.float32)  # [bs, F]
    uf = u_ref[...].astype(jnp.float32)
    h = gf * jax.lax.logistic(gf) * uf  # silu(gate) * up
    amax = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-12)
    q_ref[...] = jnp.round(h * (127.0 / amax)).astype(jnp.int8)
    s_ref[...] = amax


def silu_mul_quant(
    gate: jax.Array,  # [rows, F] compute dtype
    up: jax.Array,  # [rows, F]
    *,
    interpret: bool = False,
):
    """(int8 rows, [rows, 1] f32 abs-max) of silu(gate) * up in one VMEM
    pass. The XLA chain behind `apply_linear_a8(silu(g) * u, w)` re-reads
    the [rows, F] gated intermediate twice in f32 (amax reduce + quantize)
    — ~124 ms per B=48 7B prefill (traced); here silu/mul/amax/round all
    happen on the block in VMEM and the int8 rows are the only HBM write.
    Same math as `apply_linear_a8`'s quantization (f32 silu, amax >= 1e-12,
    round). Pair with `quant.apply_linear_a8_prequant` for the down proj.

    Replaces the act-quant half of the reference's fp16 MLP
    (`/root/reference/models/ullava.py` via HF LlamaMLP)."""
    rows, F = gate.shape
    # f32 temps dominate VMEM: ~22 B/element across g/u/h copies.
    cap = max(8, (48 << 20) // (F * 22))
    bs = next(
        (b for b in (256, 128, 64, 32, 16, 8) if b <= cap and rows % b == 0),
        rows,
    )
    q, s = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=(rows // bs,),
        in_specs=[
            pl.BlockSpec((bs, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bs, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, F), jnp.int8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(gate, up)
    return q, s


def _ln_linear_kernel(
    *refs,
    eps: float, w8a8: bool, ln: bool, residual: bool,
):
    # refs: x, [ln_s, ln_b], w, s, b, [res], o  (flags pick the layout)
    it = iter(refs)
    x_ref = next(it)
    ln_s_ref = next(it) if ln else None
    ln_b_ref = next(it) if ln else None
    w_ref, s_ref, b_ref = next(it), next(it), next(it)
    res_ref = next(it) if residual else None
    o_ref = next(it)

    def one(x, res, store):
        xf = x.astype(jnp.float32)
        if ln:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            xf = (xf - mean) * jax.lax.rsqrt(var + eps)
            xf = xf * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(
                jnp.float32
            )
        if w8a8:
            xq, xs = _row_quant(xf)
            y = jax.lax.dot_general(
                xq, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            y = y * (xs * s_ref[...]) + b_ref[...].astype(jnp.float32)
        else:
            w = w_ref[...].astype(o_ref.dtype)
            y = jax.lax.dot_general(
                xf.astype(o_ref.dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y * s_ref[...] + b_ref[...].astype(jnp.float32)
        if res is not None:
            y = y + res.astype(jnp.float32)
        store(y.astype(o_ref.dtype))

    if x_ref.ndim == 3:
        for wi in range(x_ref.shape[0]):
            one(
                x_ref[wi],
                res_ref[wi] if residual else None,
                lambda y, wi=wi: o_ref.__setitem__(wi, y),
            )
    else:
        one(
            x_ref[...],
            res_ref[...] if residual else None,
            lambda y: o_ref.__setitem__(Ellipsis, y),
        )


def fused_ln_linear(
    x: jax.Array,  # [N, T, C] window-major classes, or [T, C] flat tokens
    ln_scale: "jax.Array | None",  # [C]; None skips the LN (plain linear)
    ln_bias: "jax.Array | None",  # [C]
    w_q: jax.Array,  # [C, F] int8
    w_scale: jax.Array,  # [1, F] f32
    bias: jax.Array,  # [F]
    eps: float,
    w8a8: bool = True,
    residual: "jax.Array | None" = None,  # [N, T, F] added to the output
    interpret: bool = False,
) -> jax.Array:
    """LN(x) @ W + b in one fused pass (a transformer block's qkv/proj
    prologue). Replaces the XLA lowering's separate fp32 LN fusions
    (three HBM passes over the residual stream at serving batch) plus a
    dequantizing bf16 matmul: LN statistics and the per-row activation
    quantization happen in VMEM and the dot runs int8 x int8 when w8a8.

    The 3-D form is layout-preserving for the SAM resident window classes
    ([N, 196, C] with 196 not tile-aligned): the grid walks groups of
    whole windows, so neither the flat-reshape copy nor XLA's batched-
    conv relayout ever exists. The weight is not chunked (one [C, F]
    block, a few MB int8, cached across programs).

    Reference computation: `/root/reference/models/segment_anything/
    modeling/image_encoder.py` Block.norm1 + Attention.qkv."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
        if residual is not None and residual.ndim == 2:
            residual = residual[None]
    N, T, C = x.shape
    F = w_q.shape[1]
    # ~8 windows (or >=1024 rows) per program: balances launch count
    # against VMEM residency for the [Wb, T, F] output block.
    wb = 1
    while wb < N and wb * T < 1024 and N % (wb * 2) == 0:
        wb *= 2
    kernel = functools.partial(
        _ln_linear_kernel, eps=eps, w8a8=w8a8,
        ln=ln_scale is not None, residual=residual is not None,
    )

    vec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, d), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    tok_spec = pl.BlockSpec(
        (wb, T, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [tok_spec]
    operands = [x]
    if ln_scale is not None:
        in_specs += [vec(C), vec(C)]
        operands += [ln_scale.reshape(1, C), ln_bias.reshape(1, C)]
    in_specs += [
        pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec(F), vec(F),
    ]
    operands += [
        w_q, w_scale.reshape(1, F).astype(jnp.float32), bias.reshape(1, F),
    ]
    if residual is not None:
        assert residual.shape[-1] == F
        in_specs.append(
            pl.BlockSpec((wb, T, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual if residual.ndim == 3 else residual[None])

    out = pl.pallas_call(
        kernel,
        grid=(N // wb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (wb, T, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, T, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return out[0] if squeeze else out


def _ln_linear2_kernel(
    x_ref, ln_s_ref, ln_b_ref,
    w_ref, s_ref, b_ref,
    w2_ref, s2_ref, b2_ref,
    o_ref, o2_ref,
    *, eps: float, w8a8: bool,
):
    rows2 = o2_ref.shape[1]  # <= T: second output may drop pad tail rows
    for wi in range(x_ref.shape[0]):
        xf = x_ref[wi].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + eps)
        xf = xf * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(
            jnp.float32
        )
        if w8a8:
            xq, xs = _row_quant(xf)
            y = jax.lax.dot_general(
                xq, w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (xs * s_ref[...]) + b_ref[...].astype(
                jnp.float32
            )
            p = jax.lax.dot_general(
                xq, w2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (xs * s2_ref[...]) + b2_ref[...].astype(
                jnp.float32
            )
        else:
            xh = xf.astype(o_ref.dtype)
            y = jax.lax.dot_general(
                xh, w_ref[...].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s_ref[...] + b_ref[...].astype(jnp.float32)
            p = jax.lax.dot_general(
                xh, w2_ref[...].astype(o_ref.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s2_ref[...] + b2_ref[...].astype(jnp.float32)
        o_ref[wi] = y.astype(o_ref.dtype)
        # Prefix row slice (aligned start): pad tail rows of the padded
        # window layout carry no bias terms.
        o2_ref[wi] = p[:rows2].astype(o2_ref.dtype)


def fused_ln_linear_dual(
    x: jax.Array,  # [N, T, C] (window-major classes) or [T, C]
    ln_scale: jax.Array,  # [C]
    ln_bias: jax.Array,  # [C]
    w_q: jax.Array,  # [C, F] int8
    w_scale: jax.Array,  # [1, F] f32
    bias: jax.Array,  # [F]
    w2_q: jax.Array,  # [C, F2] int8 (e.g. composite rel-pos bias weights)
    w2_scale: jax.Array,  # [1, F2] f32
    bias2: jax.Array,  # [F2]
    eps: float,
    w8a8: bool = True,
    rows2: int = 0,
    interpret: bool = False,
):
    """`fused_ln_linear` with a second weight set sharing the same LN'd
    (and quantized) activations: returns (x_n @ W + b, x_n @ W2 + b2).
    `rows2` (0 = T) trims the second output to its leading rows — the
    padded window layout carries pad tail rows in y but not in the
    bias-term matrix.

    Built for the SAM window blocks' decomposed rel-pos bias terms: since
    A = (LN(x) @ Wq + bq) @ BD(rel_pos) = LN(x) @ (Wq @ BD) + bq @ BD, the
    per-layer composite weight Wq @ BD can be precomputed
    (`image_encoder.precompute_window_bias_weights`) and the bias terms
    fall out of the qkv projection pass itself — the standalone
    [*, T, 3C] x [3C -> H*(2W-1)] bias matmuls and their layout copies
    (~88 ms per ViT-H B=48 encode) never exist.

    Reference computation: `/root/reference/models/segment_anything/
    modeling/image_encoder.py:321-393` (decomposed rel-pos bias)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    N, T, C = x.shape
    F = w_q.shape[1]
    F2 = w2_q.shape[1]
    rows2 = rows2 or T
    wb = 1
    while wb < N and wb * T < 1024 and N % (wb * 2) == 0:
        wb *= 2
    kernel = functools.partial(_ln_linear2_kernel, eps=eps, w8a8=w8a8)
    vec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, d), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(N // wb,),
        in_specs=[
            pl.BlockSpec((wb, T, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),
            pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(F), vec(F),
            pl.BlockSpec((C, F2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(F2), vec(F2),
        ],
        out_specs=[
            pl.BlockSpec((wb, T, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, rows2, F2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, F), x.dtype),
            jax.ShapeDtypeStruct((N, rows2, F2), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
        w_q, w_scale.reshape(1, F).astype(jnp.float32), bias.reshape(1, F),
        w2_q, w2_scale.reshape(1, F2).astype(jnp.float32),
        bias2.reshape(1, F2),
    )
    y, p = outs
    return (y[0], p[0]) if squeeze else (y, p)


def fused_linear(
    x: jax.Array,  # [N, T, C] or [T, C]
    w_q: jax.Array,  # [C, F] int8
    w_scale: jax.Array,  # [1, F] f32
    bias: jax.Array,  # [F]
    residual: "jax.Array | None" = None,  # [N, T, F] added to the output
    w8a8: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """x @ W + b (+ residual), layout-preserving 3-D form — the
    post-attention projection counterpart of `fused_ln_linear` (see its
    docstring for why the batched-conv/flat-reshape alternatives cost a
    relayout copy on non-tile-aligned window classes)."""
    return fused_ln_linear(
        x, None, None, w_q, w_scale, bias, 0.0,
        w8a8=w8a8, residual=residual, interpret=interpret,
    )
