"""Normalization primitives.

Computed in float32 regardless of input dtype (bf16-safe), cast back to the
input dtype — the standard TPU mixed-precision recipe. LayerNorm variants
lean on XLA fusion; RMSNorm has a Pallas fwd/bwd pair because the XLA
lowering of the stage-1 train step materialized the norm fusions at ~10x
their HBM roofline (traced: ~177 ms of a 1160 ms seq-1024 step across the
fwd/bwd/remat instances), while one VMEM pass per block is roofline-exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rms_fwd_kernel(x_ref, w_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # [bs, D]
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    wf = w_ref[...].astype(jnp.float32)  # [1, D]
    o_ref[...] = (xf * r * wf).astype(o_ref.dtype)


def _rms_bwd_kernel(x_ref, w_ref, dy_ref, dx_ref, dw_ref, *, eps: float):
    i = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)  # [bs, D]
    dyf = dy_ref[...].astype(jnp.float32)
    wf = w_ref[...].astype(jnp.float32)  # [1, D]
    D = xf.shape[1]
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    dyw = dyf * wf
    c = jnp.sum(dyw * xf, axis=1, keepdims=True) * (1.0 / D)  # [bs, 1]
    dx_ref[...] = ((dyw - xf * (r * r) * c) * r).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # dw accumulates across the sequential grid into one [1, D] f32 block.
    dw_ref[...] += jnp.sum(dyf * xf * r, axis=0, keepdims=True)


def _rms_block_rows(rows: int, D: int) -> int:
    # The bwd kernel holds ~4 f32 + 3 bf16 copies of the block on the
    # Mosaic stack (~22 B/elem measured); keep that under ~24 MB.
    cap = max(8, (24 << 20) // (D * 22))
    for bs in (512, 256, 128, 64, 32, 16, 8):
        if bs <= cap and rows % bs == 0:
            return bs
    return rows


def _rms_fwd_call(x2, w, eps, interpret):
    rows, D = x2.shape
    bs = _rms_block_rows(rows, D)
    return pl.pallas_call(
        functools.partial(_rms_fwd_kernel, eps=eps),
        grid=(rows // bs,),
        in_specs=[
            pl.BlockSpec((bs, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bs, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, D), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, w.reshape(1, D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rms_norm_pallas(x2, w, eps, interpret):
    return _rms_fwd_call(x2, w, eps, interpret)


def _rms_vjp_fwd(x2, w, eps, interpret):
    return _rms_fwd_call(x2, w, eps, interpret), (x2, w)


def _rms_vjp_bwd(eps, interpret, res, dy):
    x2, w = res
    rows, D = x2.shape
    bs = _rms_block_rows(rows, D)
    dx, dw = pl.pallas_call(
        functools.partial(_rms_bwd_kernel, eps=eps),
        grid=(rows // bs,),
        in_specs=[
            pl.BlockSpec((bs, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((bs, D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bs, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, D), x2.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x2, w.reshape(1, D), dy)
    return dx, dw.reshape(w.shape).astype(w.dtype)


_rms_norm_pallas.defvjp(_rms_vjp_fwd, _rms_vjp_bwd)


def _rms_quant_kernel(*refs, eps: float, residual: bool):
    # refs: x, [res], w, [h_out], q_out, s_out
    it = iter(refs)
    x_ref = next(it)
    res_ref = next(it) if residual else None
    w_ref = next(it)
    h_ref = next(it) if residual else None
    q_ref, s_ref = next(it), next(it)

    xf = x_ref[...].astype(jnp.float32)  # [bs, D]
    if residual:
        xf = xf + res_ref[...].astype(jnp.float32)
        h_ref[...] = xf.astype(h_ref.dtype)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    n = xf * r * w_ref[...].astype(jnp.float32)
    # Same per-row symmetric int8 recipe as quant.apply_linear_a8 /
    # mlp_kernel._row_quant: s_out carries the raw abs-max (consumers
    # apply amax/127 in the dequant rescale).
    amax = jnp.maximum(jnp.max(jnp.abs(n), axis=1, keepdims=True), 1e-12)
    q_ref[...] = jnp.round(n * (127.0 / amax)).astype(jnp.int8)
    s_ref[...] = amax


def _rms_quant_call(x2, res2, w, eps, interpret):
    rows, D = x2.shape
    bs = _rms_block_rows(rows, D)
    residual = res2 is not None
    row_spec = pl.BlockSpec((bs, D), lambda i: (i, 0))
    w_spec = pl.BlockSpec((1, D), lambda i: (0, 0))
    s_spec = pl.BlockSpec((bs, 1), lambda i: (i, 0))
    in_specs = [row_spec] + ([row_spec] if residual else []) + [w_spec]
    operands = [x2] + ([res2] if residual else []) + [w.reshape(1, D)]
    out_specs = ([row_spec] if residual else []) + [row_spec, s_spec]
    out_shape = (
        [jax.ShapeDtypeStruct((rows, D), x2.dtype)] if residual else []
    ) + [
        jax.ShapeDtypeStruct((rows, D), jnp.int8),
        jax.ShapeDtypeStruct((rows, 1), jnp.float32),
    ]
    out = pl.pallas_call(
        functools.partial(_rms_quant_kernel, eps=eps, residual=residual),
        grid=(rows // bs,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return out


def rms_norm_quant(
    x: jax.Array, weight: jax.Array, eps: float = 1e-6,
    interpret: bool = False,
):
    """(int8 rows, [rows, 1] f32 abs-max) of RMSNorm(x) in one VMEM pass —
    the W8A8 prefill's norm + per-row activation quantize without the
    separate XLA quantize pass over the [B*S, D] normed stream. Pair with
    `quant.apply_linear_a8_prequant`. Forward-only (serving)."""
    D = x.shape[-1]
    xq, xs = _rms_quant_call(x.reshape(-1, D), None, weight, float(eps), interpret)
    return xq.reshape(x.shape), xs


def rms_norm_residual_quant(
    x: jax.Array, res: jax.Array, weight: jax.Array, eps: float = 1e-6,
    interpret: bool = False,
):
    """(h = x + res, int8 rows of RMSNorm(h), [rows, 1] abs-max) fused:
    the pre-norm residual add, the norm, and the W8A8 activation quantize
    are one HBM pass instead of three (the add and quantize each cost a
    full read+write of the [B*S, D] stream at serving prefill shapes).
    Forward-only (serving)."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    h, xq, xs = _rms_quant_call(
        x.reshape(-1, D), res.reshape(-1, D), weight, float(eps), interpret
    )
    return h.reshape(x.shape), xq.reshape(x.shape), xs


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _use_rms_pallas(x: jax.Array) -> bool:
    if not _on_tpu():
        return False
    D = x.shape[-1]
    rows = x.size // D
    # >= 4096 rows: measured +1.4% on the stage-1 seq-1024 step (4096
    # rows) but -3.6% on the stage-2 LoRA step (2048 rows), where the
    # custom-VJP boundary costs more fusion than the kernel saves.
    return D % 128 == 0 and rows % 8 == 0 and rows >= 4096


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LLaMA-style RMSNorm: x / rms(x) * w, statistics in fp32.

    Large inputs on TPU take a Pallas fwd/bwd pair (one VMEM pass per row
    block; dw accumulated across the sequential grid) — same f32 math as
    the XLA path. Small inputs (decode steps) and other backends keep the
    XLA lowering."""
    if _use_rms_pallas(x):
        lead = x.shape[:-1]
        y = _rms_norm_pallas(
            x.reshape(-1, x.shape[-1]), weight, float(eps), False
        )
        return y.reshape(*lead, x.shape[-1])
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """Standard LayerNorm (CLIP/SAM towers), statistics in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)


def layer_norm_2d(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-6):
    """Channels-first LayerNorm over axis 1 for NCHW feature maps
    (SAM neck uses this; reference `modeling/common.py:26-43`)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32)[None, :, None, None]
    out = out + bias.astype(jnp.float32)[None, :, None, None]
    return out.astype(dtype)
