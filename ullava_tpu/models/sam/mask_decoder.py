"""SAM mask decoder + two-way transformer, TPU-native.

Functional redesign of the reference's vendored decoder
(`/root/reference/models/segment_anything/modeling/{mask_decoder,transformer}.py`):
iou token + 4 mask tokens, depth-2 token<->image cross-attention with
rate-2 head downsampling, transpose-conv upscaling, per-token hypernetwork
MLPs, and the IoU prediction head. NHWC layout; upscaling transpose convs
run as `conv_transpose`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.ops.attention import attention_xla
from ullava_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SamDecoderConfig:
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    layer_norm_eps: float = 1e-5  # torch nn.LayerNorm default in decoder
    dtype: Any = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @classmethod
    def tiny(cls, **kw) -> "SamDecoderConfig":
        defaults = dict(embed_dim=16, num_heads=2, mlp_dim=32, iou_head_hidden_dim=16)
        defaults.update(kw)
        return cls(**defaults)


def _linear(key, i, o, dtype):
    bound = (1.0 / i) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (i, o), jnp.float32, -bound, bound).astype(dtype),
        "b": jax.random.uniform(kb, (o,), jnp.float32, -bound, bound).astype(dtype),
    }


def _attn_init(key, cfg: SamDecoderConfig, downsample: bool):
    D = cfg.embed_dim
    inner = D // cfg.attention_downsample_rate if downsample else D
    ks = jax.random.split(key, 4)
    return {
        "q": _linear(ks[0], D, inner, cfg.dtype),
        "k": _linear(ks[1], D, inner, cfg.dtype),
        "v": _linear(ks[2], D, inner, cfg.dtype),
        "out": _linear(ks[3], inner, D, cfg.dtype),
    }


def _ln_init(cfg):
    return {"scale": jnp.ones((cfg.embed_dim,), cfg.dtype),
            "bias": jnp.zeros((cfg.embed_dim,), cfg.dtype)}


def _mlp_init(key, dims, dtype):
    ks = jax.random.split(key, len(dims) - 1)
    return {f"fc{i}": _linear(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(ks)}


def init_params(rng: jax.Array, cfg: SamDecoderConfig) -> Params:
    D = cfg.embed_dim
    k = jax.random.split(rng, 8 + cfg.depth)
    layers = []
    for i in range(cfg.depth):
        ks = jax.random.split(k[i], 5)
        layers.append({
            "self_attn": _attn_init(ks[0], cfg, downsample=False),
            "ln1": _ln_init(cfg),
            "cross_t2i": _attn_init(ks[1], cfg, downsample=True),
            "ln2": _ln_init(cfg),
            "mlp": _mlp_init(ks[2], [D, cfg.mlp_dim, D], cfg.dtype),
            "ln3": _ln_init(cfg),
            "cross_i2t": _attn_init(ks[3], cfg, downsample=True),
            "ln4": _ln_init(cfg),
        })
    kk = k[cfg.depth:]
    return {
        "iou_token": (0.02 * jax.random.normal(kk[0], (1, D), jnp.float32)).astype(cfg.dtype),
        "mask_tokens": (0.02 * jax.random.normal(kk[1], (cfg.num_mask_tokens, D), jnp.float32)).astype(cfg.dtype),
        "layers": layers,
        "final_attn": _attn_init(kk[2], cfg, downsample=True),
        "final_ln": _ln_init(cfg),
        "upscale_conv1": (0.02 * jax.random.normal(kk[3], (2, 2, D, D // 4), jnp.float32)).astype(cfg.dtype),
        "upscale_conv1_bias": jnp.zeros((D // 4,), cfg.dtype),
        "upscale_ln": {"scale": jnp.ones((D // 4,), cfg.dtype), "bias": jnp.zeros((D // 4,), cfg.dtype)},
        "upscale_conv2": (0.02 * jax.random.normal(kk[4], (2, 2, D // 4, D // 8), jnp.float32)).astype(cfg.dtype),
        "upscale_conv2_bias": jnp.zeros((D // 8,), cfg.dtype),
        "hyper_mlps": [
            _mlp_init(jax.random.fold_in(kk[5], i), [D, D, D, D // 8], cfg.dtype)
            for i in range(cfg.num_mask_tokens)
        ],
        "iou_head": _mlp_init(
            kk[6],
            [D] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1) + [cfg.num_mask_tokens],
            cfg.dtype,
        ),
    }


def _apply_attn(p: Params, cfg, q, k, v):
    """Downsampled multi-head attention [B, S, D] streams."""
    B, Sq, _ = q.shape
    inner = p["q"]["w"].shape[1]
    H = cfg.num_heads
    hd = inner // H
    qh = (q @ p["q"]["w"] + p["q"]["b"]).reshape(B, Sq, H, hd)
    kh = (k @ p["k"]["w"] + p["k"]["b"]).reshape(B, k.shape[1], H, hd)
    vh = (v @ p["v"]["w"] + p["v"]["b"]).reshape(B, v.shape[1], H, hd)
    out = attention_xla(qh, kh, vh, scale=hd**-0.5)
    return out.reshape(B, Sq, inner) @ p["out"]["w"] + p["out"]["b"]


def _apply_mlp(p, x, act=jax.nn.relu):
    n = len(p)
    for i in range(n):
        x = x @ p[f"fc{i}"]["w"] + p[f"fc{i}"]["b"]
        if i < n - 1:
            x = act(x)
    return x


def _two_way_block(
    p: Params, cfg: SamDecoderConfig,
    queries, keys, query_pe, key_pe, skip_first_layer_pe: bool,
):
    eps = cfg.layer_norm_eps
    if skip_first_layer_pe:
        queries = _apply_attn(p["self_attn"], cfg, queries, queries, queries)
    else:
        q = queries + query_pe
        queries = queries + _apply_attn(p["self_attn"], cfg, q, q, queries)
    queries = layer_norm(queries, p["ln1"]["scale"], p["ln1"]["bias"], eps)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _apply_attn(p["cross_t2i"], cfg, q, k, keys)
    queries = layer_norm(queries, p["ln2"]["scale"], p["ln2"]["bias"], eps)

    queries = queries + _apply_mlp(p["mlp"], queries)
    queries = layer_norm(queries, p["ln3"]["scale"], p["ln3"]["bias"], eps)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _apply_attn(p["cross_i2t"], cfg, k, q, queries)
    keys = layer_norm(keys, p["ln4"]["scale"], p["ln4"]["bias"], eps)
    return queries, keys


def two_way_transformer(
    params: Params, cfg: SamDecoderConfig,
    image_embedding: jax.Array,  # [B, g, g, D]
    image_pe: jax.Array,  # [g, g, D]
    point_embedding: jax.Array,  # [B, Nt, D]
):
    B, g, _, D = image_embedding.shape
    keys = image_embedding.reshape(B, g * g, D)
    key_pe = jnp.broadcast_to(image_pe.reshape(1, g * g, D), keys.shape)
    queries = point_embedding

    for i, lp in enumerate(params["layers"]):
        queries, keys = _two_way_block(
            lp, cfg, queries, keys, point_embedding, key_pe, skip_first_layer_pe=(i == 0)
        )

    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + _apply_attn(params["final_attn"], cfg, q, k, keys)
    queries = layer_norm(
        queries, params["final_ln"]["scale"], params["final_ln"]["bias"], cfg.layer_norm_eps
    )
    return queries, keys


def _upscale2x(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d(kernel=2, stride=2) as an explicit einsum+reshape.

    Kernel layout [kh, kw, in, out] with torch semantics
    out[2i+di, 2j+dj, o] = sum_c x[i, j, c] * K[di, dj, c, o]
    (no overlap when kernel == stride, so this is exact and MXU-shaped).
    """
    B, h, w, C = x.shape
    out = jnp.einsum("bhwc,ijco->bhiwjo", x, kernel)
    return out.reshape(B, 2 * h, 2 * w, kernel.shape[-1])


def decode_masks(
    params: Params,
    cfg: SamDecoderConfig,
    image_embeddings: jax.Array,  # [B, g, g, D]
    image_pe: jax.Array,  # [g, g, D]
    sparse_prompt: jax.Array,  # [B, Ns, D]
    dense_prompt: jax.Array,  # [B, g, g, D]
    multimask_output: bool = False,
    return_all: bool = False,  # all mask tokens (export's selection trick)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (low_res_masks [B, M, 4g, 4g], iou_pred [B, M])."""
    B = sparse_prompt.shape[0]
    D = cfg.embed_dim
    g = image_embeddings.shape[1]

    output_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens, (B,) + output_tokens.shape), sparse_prompt],
        axis=1,
    )
    src = image_embeddings + dense_prompt

    hs, src_out = two_way_transformer(params, cfg, src, image_pe, tokens)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1 : 1 + cfg.num_mask_tokens]

    x = src_out.reshape(B, g, g, D)
    x = _upscale2x(x, params["upscale_conv1"]) + params["upscale_conv1_bias"]
    x = layer_norm(x, params["upscale_ln"]["scale"], params["upscale_ln"]["bias"], 1e-6)
    x = jax.nn.gelu(x, approximate=False)
    x = _upscale2x(x, params["upscale_conv2"]) + params["upscale_conv2_bias"]
    x = jax.nn.gelu(x, approximate=False)  # [B, 4g, 4g, D//8]

    hyper = jnp.stack(
        [
            _apply_mlp(params["hyper_mlps"][i], mask_tokens_out[:, i])
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # [B, M, D//8]
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, x)
    iou_pred = _apply_mlp(params["iou_head"], iou_token_out)

    if return_all:
        return masks, iou_pred
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, sl], iou_pred[:, sl]
