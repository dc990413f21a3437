"""Int8 weight-only quantization for frozen towers.

Serving on a single 16 GB v5e cannot hold the full bf16 stack
(LLaMA-7B 13.5 GB + SAM ViT-H 1.26 GB + CLIP ViT-L 0.6 GB ≈ 15.4 GB of
15.75 GB usable — measured OOM). The frozen SAM/CLIP encoders are
quantization-friendly (cf. EfficientViT-SAM line of work), so their
matmul weights store as int8 + per-output-channel scales (~4x smaller)
and dequantize on the fly inside the matmul — weight HBM traffic drops
4x too, which is a throughput win for the bandwidth-bound windowed
attention projections.

`apply_linear(x, w)` accepts either a plain array or a quantized
{"q": int8, "scale": f32} leaf, so model code is layout-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Union

import jax
import jax.numpy as jnp

QuantLeaf = Dict[str, jax.Array]
MaybeQuant = Union[jax.Array, QuantLeaf]


def quantize_int8(w: jax.Array) -> QuantLeaf:
    """Symmetric per-output-channel int8: reduce over the contraction
    axis (-2) only, so stacked [L, in, out] weights keep per-layer
    scales (scan-sliceable)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize(leaf: MaybeQuant, dtype=jnp.bfloat16) -> jax.Array:
    if is_quantized(leaf):
        return (leaf["q"].astype(jnp.float32) * leaf["scale"]).astype(dtype)
    return leaf


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "scale" in leaf


def _sublane(dtype) -> int:
    return {1: 32, 2: 16}.get(jnp.dtype(dtype).itemsize, 8)


def apply_linear_a8(x: jax.Array, w: QuantLeaf) -> jax.Array:
    """W8A8 matmul: per-row dynamic int8 activation quantization feeding an
    int8 x int8 MXU dot (~1.6x the bf16 rate on v5e), rescaled by
    act_scale x per-output-channel weight scale. Serving-only knob — the
    rounding error is larger than weight-only int8."""
    lead = x.shape[:-1]
    # Same flattening rule as apply_linear: merge leading dims only when
    # the merge is sublane-tile aligned (otherwise XLA inserts a relayout
    # copy of the activations that costs more than the batched dot).
    flat = len(lead) > 1 and all(d % _sublane(x.dtype) == 0 for d in x.shape[1:-1])
    xin = x.reshape(-1, x.shape[-1]) if flat or len(lead) == 1 else x
    xf = xin.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    xq = jnp.round(xf * (127.0 / amax)).astype(jnp.int8)
    ndim = xq.ndim
    y = jax.lax.dot_general(
        xq, w["q"], (((ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (
        y.astype(jnp.float32)
        * (amax * (1.0 / 127.0))
        * w["scale"].reshape((1,) * (y.ndim - 1) + (-1,))
    )
    return y.astype(x.dtype).reshape(*lead, y.shape[-1])


def apply_linear_a8_prequant(
    xq: jax.Array,  # [rows, K] int8 (pre-quantized activations)
    amax: jax.Array,  # [rows, 1] f32 per-row abs-max
    w: QuantLeaf,
    out_dtype,
) -> jax.Array:
    """The dot + rescale tail of `apply_linear_a8` for activations already
    quantized elsewhere (e.g. by the fused silu-mul-quantize kernel)."""
    y = jax.lax.dot_general(
        xq, w["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (
        y.astype(jnp.float32)
        * (amax * (1.0 / 127.0))
        * w["scale"].reshape(1, -1)
    )
    return y.astype(out_dtype)


def apply_linear(x: jax.Array, w: MaybeQuant) -> jax.Array:
    """x @ w with transparent int8 dequant (scale folded post-matmul).

    When every merged-in leading dim is sublane-tile aligned, leading dims
    are flattened so the dot is a plain 2-D matmul — XLA keeps >2-D dots
    batched (e.g. [16,64,64,1280]@[1280,5120] runs as 1024 M=64 matmuls
    with poor MXU window bounds; measured ~2x slower on v5e than the flat
    form). Non-aligned merges (e.g. [400,196,1280], 196 % 16 != 0) would
    force a real relayout copy of the activations, so those stay batched."""
    lead = x.shape[:-1]
    flat = len(lead) > 1 and all(d % _sublane(x.dtype) == 0 for d in x.shape[1:-1])
    xin = x.reshape(-1, x.shape[-1]) if flat else x
    if is_quantized(w):
        y = jnp.matmul(xin, w["q"].astype(x.dtype))
        y = (
            y.astype(jnp.float32)
            * w["scale"].reshape((1,) * (y.ndim - 1) + (-1,))
        ).astype(x.dtype)
    else:
        y = xin @ w
    return y.reshape(*lead, y.shape[-1]) if flat else y


def quantize_tree(params: Any, key_names: Sequence[str]) -> Any:
    """Quantize every leaf whose dict key is in `key_names` (>=2-D only)."""
    names = set(key_names)

    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in names and hasattr(v, "ndim") and v.ndim >= 2:
                    out[k] = quantize_int8(v)
                else:
                    out[k] = rec(v)
            return out
        if isinstance(node, list):
            return [rec(v) for v in node]
        return node

    return rec(params)


SAM_ENCODER_QUANT_KEYS = ("qkv", "proj", "fc1", "fc2", "patch_proj")
LLAMA_QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)
CLIP_QUANT_KEYS = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2", "patch_proj")
