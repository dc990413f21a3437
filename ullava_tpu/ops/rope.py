"""Rotary position embeddings (GPT-NeoX / HF-LLaMA "rotate_half" layout).

The half-split layout matters: converted HF checkpoints assume q/k feature
dims are ordered [d/2 cos-partners | d/2 sin-partners], so we implement the
same convention rather than the interleaved original-paper layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rope_cos_sin(
    positions: jax.Array,  # [B, S] or [S] int32
    head_dim: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions: [..., S, head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., S, d/2]
    angles = jnp.concatenate([angles, angles], axis=-1)  # [..., S, d]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, S, Hkv, D]
    cos: jax.Array,  # [B, S, D] or [S, D]
    sin: jax.Array,
    compute_dtype=None,  # None -> fp32 (training default)
) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary embedding to q and k (head axis broadcast).

    compute_dtype=bf16 is a serving knob: the fp32 rotation forces XLA to
    materialize fp32 q/k staging tensors between fusions (~150 ms per 7B
    prefill at B=32); bf16 keeps the chain in the weights' dtype at a
    ~1e-3 relative rounding cost."""
    cd = compute_dtype or jnp.float32
    # Broadcast cos/sin over the head axis: [..., S, 1, D]
    c = jnp.expand_dims(cos, axis=-2)
    s = jnp.expand_dims(sin, axis=-2)
    orig_dtype = q.dtype
    qf, kf = q.astype(cd), k.astype(cd)
    cf, sf = c.astype(cd), s.astype(cd)
    q_out = qf * cf + _rotate_half(qf) * sf
    k_out = kf * cf + _rotate_half(kf) * sf
    return q_out.astype(orig_dtype), k_out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Fused rotary kernel (serving prefill).
#
# The XLA lowering of `apply_rotary` at 7B prefill shape materializes the
# whole rotate_half chain in HBM: two slice+negate fusions, two
# multiply-add fusions, the cos/sin head broadcast, and the 4-D -> flat
# relayouts afterwards — ~2.5 GB of traffic per layer at B=48/S=320
# (~5.5 ms/layer, ~177 ms per prefill, traced). The rotation itself is a
# pure per-row lane shuffle, so one Pallas pass does it in a single
# read+write of q and k: partner(x)[l] = -/+ x[l +/- hd/2] via two lane
# rolls and a half mask, fp32 arithmetic in VMEM, bf16 in/out.
# ---------------------------------------------------------------------------


def _rope_kernel(x_ref, c_ref, s_ref, o_ref, *, head_dim: int):
    import jax.numpy as jnp  # noqa: F811 (kernel-local)

    x = x_ref[...].astype(jnp.float32)
    rows, width = x.shape
    reps = width // head_dim
    half = head_dim // 2
    c = jnp.concatenate([c_ref[...].astype(jnp.float32)] * reps, axis=-1)
    s = jnp.concatenate([s_ref[...].astype(jnp.float32)] * reps, axis=-1)
    # rotate_half as full-row lane rolls: for lane l with (l % hd) < hd/2
    # the partner is -x[l + hd/2]; else +x[l - hd/2]. Rolls never cross a
    # head boundary for the lanes the mask selects.
    fwd = jnp.roll(x, -half, axis=-1)  # x[l + hd/2]
    bwd = jnp.roll(x, half, axis=-1)  # x[l - hd/2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    first = (lane % head_dim) < half
    partner = jnp.where(first, -fwd, bwd)
    o_ref[...] = (x * c + partner * s).astype(o_ref.dtype)


def fused_rotary(
    x: jax.Array,  # [R, H*hd] flat rows (R = B*S)
    cos: jax.Array,  # [R, hd]
    sin: jax.Array,  # [R, hd]
    head_dim: int,
    block_r: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """One-pass rotary rotation over flat [R, H*hd] rows (see above).
    fp32 arithmetic in VMEM (matching the training-path `rope_f32=True`
    semantics to within bf16 output rounding) at bf16 I/O traffic."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, width = x.shape
    assert cos.shape == (R, head_dim), (cos.shape, R, head_dim)
    assert width % head_dim == 0 and head_dim % 2 == 0
    while block_r > 1 and R % block_r:
        block_r //= 2
    kernel = functools.partial(_rope_kernel, head_dim=head_dim)
    row_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (block_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(R // block_r,),
        in_specs=[row_spec(width), row_spec(head_dim), row_spec(head_dim)],
        out_specs=row_spec(width),
        out_shape=jax.ShapeDtypeStruct((R, width), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # fp32 intermediates of the [block_r, width] tile (x, two
            # rolls, partner, tables) exceed the 24 MB default scope.
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, cos, sin)
