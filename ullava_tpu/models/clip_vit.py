"""CLIP ViT vision tower, TPU-native.

Replaces the frozen HF `CLIPVisionModel` the reference wraps
(`/root/reference/models/ullava_core.py:100-115,146-158`): patch embedding
as an explicit patchify+matmul (MXU-shaped, no conv lowering), class token
+ learned positions, pre-LN transformer with quick-GELU MLPs, and
`lax.scan` over stacked layers.

The intermediate-layer readout (`vision_hidden_layer`, default -2 in the
reference configs) is implemented by scanning only the first
`L + 1 + idx` layers — selecting hidden_states[idx] without materializing
every layer's output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ullava_tpu.ops.attention import attention
from ullava_tpu.ops.norms import layer_norm
from ullava_tpu.ops.quant import apply_linear

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # Serving-only knobs (the CLIP tower is frozen in every reference
    # training stage and its readout is detached, so forward-only paths
    # are safe): `a8` runs the layer linears int8 x int8 with per-row
    # dynamic activation quantization when the weights are quantized;
    # `attn_impl` 'flash' uses the lane-sliced Pallas kernel (pads the
    # 257-token sequence to a sublane multiple with masked keys) instead
    # of XLA's full-score attention.
    a8: bool = False
    attn_impl: str = "xla"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @classmethod
    def tiny(cls, **kw) -> "CLIPVisionConfig":
        defaults = dict(
            hidden_size=64, intermediate_size=128, num_layers=3, num_heads=4,
            image_size=28, patch_size=14, dtype=jnp.float32,
        )
        defaults.update(kw)
        return cls(**defaults)


def init_params(rng: jax.Array, cfg: CLIPVisionConfig) -> Params:
    k = jax.random.split(rng, 10)
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    patch_dim = 3 * cfg.patch_size * cfg.patch_size

    def w(key, shape):
        return (0.02 * jax.random.normal(key, shape, jnp.float32)).astype(cfg.dtype)

    return {
        "class_embedding": w(k[0], (D,)),
        "patch_proj": w(k[1], (patch_dim, D)),
        "position_embedding": w(k[2], (cfg.num_patches + 1, D)),
        "pre_ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
        "layers": {
            "ln1_scale": jnp.ones((L, D), cfg.dtype),
            "ln1_bias": jnp.zeros((L, D), cfg.dtype),
            "q_proj": w(k[3], (L, D, D)),
            "q_bias": jnp.zeros((L, D), cfg.dtype),
            "k_proj": w(k[4], (L, D, D)),
            "k_bias": jnp.zeros((L, D), cfg.dtype),
            "v_proj": w(k[5], (L, D, D)),
            "v_bias": jnp.zeros((L, D), cfg.dtype),
            "out_proj": w(k[6], (L, D, D)),
            "out_bias": jnp.zeros((L, D), cfg.dtype),
            "ln2_scale": jnp.ones((L, D), cfg.dtype),
            "ln2_bias": jnp.zeros((L, D), cfg.dtype),
            "fc1": w(k[7], (L, D, F)),
            "fc1_bias": jnp.zeros((L, F), cfg.dtype),
            "fc2": w(k[8], (L, F, D)),
            "fc2_bias": jnp.zeros((L, D), cfg.dtype),
        },
        "post_ln": {"scale": jnp.ones((D,), cfg.dtype), "bias": jnp.zeros((D,), cfg.dtype)},
    }


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """NHWC image -> [B, num_patches, C*p*p] with (C, ph, pw) flatten order
    (matches converted torch conv weights)."""
    B, H, W, C = pixel_values.shape
    gh, gw = H // patch_size, W // patch_size
    x = pixel_values.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gh, gw, C, ph, pw]
    return x.reshape(B, gh * gw, C * patch_size * patch_size)


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def forward(
    params: Params,
    cfg: CLIPVisionConfig,
    pixel_values: jax.Array,  # [B, H, W, 3] NHWC, CLIP-normalized
    hidden_layer: int = -1,
) -> Dict[str, jax.Array]:
    """Returns {"hidden_states": [B, 1+P, D] at the selected layer,
    "patch_features": [B, P, D] (CLS dropped — the projector input,
    reference `encode_image` semantics)}."""
    B = pixel_values.shape[0]
    D, L = cfg.hidden_size, cfg.num_layers

    x = apply_linear(patchify(pixel_values.astype(cfg.dtype), cfg.patch_size), params["patch_proj"])
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, D)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.layer_norm_eps)

    if hidden_layer < 0:
        n_layers = L + 1 + hidden_layer
    else:
        n_layers = hidden_layer
    if not 0 <= n_layers <= L:
        raise ValueError(f"hidden_layer {hidden_layer} out of range for {L} layers")

    layers = jax.tree_util.tree_map(lambda a: a[:n_layers], params["layers"])

    from ullava_tpu.ops.attention import _on_tpu
    from ullava_tpu.ops.quant import apply_linear_a8, is_quantized

    S_real = x.shape[1]
    # Serving flash path: the 257-token sequence is padded to a sublane
    # multiple (zero rows) and the pads masked out of attention via
    # kv_lens; pad-query outputs are garbage sliced off at the end. The
    # XLA path stays bit-identical to the reference (no pads).
    interp = cfg.attn_impl == "flash_interpret"
    use_flash = (
        (cfg.attn_impl == "flash" and _on_tpu() or interp)
        and (cfg.num_heads * cfg.head_dim) % 128 == 0
    )
    if use_flash and S_real % 8:
        x = jnp.pad(x, ((0, 0), (0, (-S_real) % 8), (0, 0)))
    # kv_lens only exists when pads do (keeps the XLA path mask-free).
    kv_lens = (
        jnp.full((B,), S_real, jnp.int32) if x.shape[1] != S_real else None
    )

    def lin(yin, w):
        if cfg.a8 and is_quantized(w) and _on_tpu():
            rows = 1
            for d_ in yin.shape[:-1]:
                rows *= d_
            if rows % 8 == 0:
                return apply_linear_a8(yin, w)
        return apply_linear(yin, w)

    def body(h, p):
        y = layer_norm(h, p["ln1_scale"], p["ln1_bias"], cfg.layer_norm_eps)
        S = y.shape[1]
        q = (lin(y, p["q_proj"]) + p["q_bias"]).reshape(B, S, cfg.num_heads, cfg.head_dim)
        k = (lin(y, p["k_proj"]) + p["k_bias"]).reshape(B, S, cfg.num_heads, cfg.head_dim)
        v = (lin(y, p["v_proj"]) + p["v_bias"]).reshape(B, S, cfg.num_heads, cfg.head_dim)
        if use_flash:
            from ullava_tpu.ops.attention import flash_attention_fwd_bsh

            lens = (
                kv_lens if kv_lens is not None
                else jnp.full((B,), S, jnp.int32)
            )
            a = flash_attention_fwd_bsh(
                q, k, v, lens, causal=False, scale=cfg.head_dim**-0.5,
                interpret=interp,
            )
        else:
            a = attention(q, k, v, causal=False, kv_lens=kv_lens, impl="xla")
        h = h + lin(a.reshape(B, S, D), p["out_proj"]) + p["out_bias"]
        y = layer_norm(h, p["ln2_scale"], p["ln2_bias"], cfg.layer_norm_eps)
        h = h + lin(_quick_gelu(lin(y, p["fc1"]) + p["fc1_bias"]), p["fc2"]) + p["fc2_bias"]
        return h, None

    x, _ = jax.lax.scan(body, x, layers)
    x = x[:, :S_real]
    return {"hidden_states": x, "patch_features": x[:, 1:]}
