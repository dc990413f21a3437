"""SAM prompt encoder with text-embedding prompts.

Functional redesign of the reference's modified prompt encoder
(`/root/reference/models/segment_anything/modeling/prompt_encoder.py`),
including the u-LLaVA extension that injects projected `[SEG]` hidden
states as sparse prompts (`prompt_encoder.py:121,132-133,145,176-177`).

Fixed-shape contract: points/boxes/text arrive as dense padded tensors
with validity masks; invalid points use the not-a-point embedding exactly
like the reference's label==-1 padding path, so ragged prompt counts stay
jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ullava_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SamPromptConfig:
    embed_dim: int = 256
    image_embedding_size: int = 64  # 1024 / 16
    input_image_size: int = 1024
    mask_in_chans: int = 16
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, **kw) -> "SamPromptConfig":
        defaults = dict(embed_dim=16, image_embedding_size=4, input_image_size=64,
                        mask_in_chans=4)
        defaults.update(kw)
        return cls(**defaults)


def init_params(rng: jax.Array, cfg: SamPromptConfig) -> Params:
    k = jax.random.split(rng, 9)
    D, M = cfg.embed_dim, cfg.mask_in_chans

    def n(key, shape, scale=1.0):
        return (scale * jax.random.normal(key, shape, jnp.float32)).astype(cfg.dtype)

    return {
        # PositionEmbeddingRandom gaussian matrix, scale 1.0
        "pe_gaussian": n(k[0], (2, D // 2)),
        # 4 point embeddings: neg point, pos point, box corner 1, box corner 2
        "point_embeddings": n(k[1], (4, D), 0.02),
        "not_a_point": n(k[2], (D,), 0.02),
        "no_mask": n(k[3], (D,), 0.02),
        "mask_conv1": n(k[4], (2, 2, 1, M // 4), 0.02),
        "mask_conv1_bias": jnp.zeros((M // 4,), cfg.dtype),
        "mask_ln1_scale": jnp.ones((M // 4,), cfg.dtype),
        "mask_ln1_bias": jnp.zeros((M // 4,), cfg.dtype),
        "mask_conv2": n(k[5], (2, 2, M // 4, M), 0.02),
        "mask_conv2_bias": jnp.zeros((M,), cfg.dtype),
        "mask_ln2_scale": jnp.ones((M,), cfg.dtype),
        "mask_ln2_bias": jnp.zeros((M,), cfg.dtype),
        "mask_conv3": n(k[6], (1, 1, M, D), 0.02),
        "mask_conv3_bias": jnp.zeros((D,), cfg.dtype),
    }


def _pe_encode(params: Params, coords: jax.Array) -> jax.Array:
    """Random-Fourier positional encoding of [..., 2] coords in [0, 1]."""
    c = coords.astype(jnp.float32) * 2.0 - 1.0
    proj = c @ params["pe_gaussian"].astype(jnp.float32)
    proj = 2.0 * jnp.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def dense_positional_embedding(params: Params, cfg: SamPromptConfig) -> jax.Array:
    """get_dense_pe(): [grid, grid, D] PE of the image embedding grid."""
    g = cfg.image_embedding_size
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [g, g, 2] (x, y)
    return _pe_encode(params, grid).astype(cfg.dtype)


def _embed_points(
    params: Params, cfg: SamPromptConfig, points: jax.Array, labels: jax.Array,
    pad: bool,
) -> jax.Array:
    """points [B, N, 2] pixel coords, labels [B, N] in {-1, 0, 1}."""
    pts = points + 0.5  # pixel center (reference `prompt_encoder.py:84`)
    if pad:
        # No box prompt: the reference appends one padding point with
        # label -1 (`prompt_encoder.py:86-90`).
        B = pts.shape[0]
        pts = jnp.concatenate([pts, jnp.zeros((B, 1, 2), pts.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, jnp.full((B, 1), -1, labels.dtype)], axis=1
        )
    coords = pts / cfg.input_image_size
    pe = _pe_encode(params, coords).astype(cfg.dtype)  # [B, N, D]
    emb = jnp.where(
        (labels == -1)[..., None],
        params["not_a_point"] + jnp.zeros_like(pe),
        pe
        + jnp.take(params["point_embeddings"], jnp.clip(labels, 0, 1), axis=0),
    )
    return emb


def _embed_boxes(params: Params, cfg: SamPromptConfig, boxes: jax.Array) -> jax.Array:
    """boxes [B, N, 4] xyxy pixels -> [B, 2N, D] corner embeddings."""
    B, N = boxes.shape[:2]
    corners = (boxes.reshape(B, N, 2, 2) + 0.5) / cfg.input_image_size
    pe = _pe_encode(params, corners).astype(cfg.dtype)  # [B, N, 2, D]
    pe = pe + params["point_embeddings"][2:4][None, None]
    return pe.reshape(B, 2 * N, -1)


def encode_prompts(
    params: Params,
    cfg: SamPromptConfig,
    *,
    batch: int,
    points: Optional[Tuple[jax.Array, jax.Array]] = None,  # (coords, labels)
    boxes: Optional[jax.Array] = None,
    masks: Optional[jax.Array] = None,  # [B, 4g, 4g, 1]
    text_embeds: Optional[jax.Array] = None,  # [B, N, D]
) -> Tuple[jax.Array, jax.Array]:
    """Returns (sparse [B, Ns, D], dense [B, g, g, D])."""
    D, g = cfg.embed_dim, cfg.image_embedding_size
    sparse = jnp.zeros((batch, 0, D), cfg.dtype)
    if points is not None:
        sparse = jnp.concatenate(
            [sparse, _embed_points(params, cfg, points[0], points[1], boxes is None)],
            axis=1,
        )
    if boxes is not None:
        sparse = jnp.concatenate([sparse, _embed_boxes(params, cfg, boxes)], axis=1)
    if text_embeds is not None:
        # u-LLaVA modification: projected [SEG] hidden states ride along as
        # sparse prompt tokens.
        sparse = jnp.concatenate([sparse, text_embeds.astype(cfg.dtype)], axis=1)

    if masks is not None:
        x = jax.lax.conv_general_dilated(
            masks.astype(cfg.dtype), params["mask_conv1"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["mask_conv1_bias"]
        x = layer_norm(x, params["mask_ln1_scale"], params["mask_ln1_bias"], cfg.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=False)
        x = jax.lax.conv_general_dilated(
            x, params["mask_conv2"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["mask_conv2_bias"]
        x = layer_norm(x, params["mask_ln2_scale"], params["mask_ln2_bias"], cfg.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=False)
        dense = jax.lax.conv_general_dilated(
            x, params["mask_conv3"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["mask_conv3_bias"]
    else:
        dense = jnp.broadcast_to(params["no_mask"], (batch, g, g, D))
    return sparse, dense
