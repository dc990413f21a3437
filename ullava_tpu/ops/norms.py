"""Normalization primitives.

Computed in float32 regardless of input dtype (bf16-safe), cast back to the
input dtype — the standard TPU mixed-precision recipe. XLA fuses these into
neighboring ops; no Pallas needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LLaMA-style RMSNorm: x / rms(x) * w, statistics in fp32."""
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
