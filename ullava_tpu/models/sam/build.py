"""SAM composition, factories, and pre/post-processing.

Parity targets: `/root/reference/models/segment_anything/build_sam.py:15-108`
(ViT-H/L/B geometry) and `modeling/sam.py:137-184` (preprocess /
postprocess_masks).

Fixed-shape policy: on-device postprocessing resizes low-res masks to the
padded 1024 frame (static shapes, jit-friendly); the final per-sample crop
+ resize to each image's original resolution is host-side numpy (eval
only, matches the reference's dynamic interpolate semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ullava_tpu.constants import SAM_MEAN, SAM_STD
from ullava_tpu.models.sam import image_encoder, mask_decoder, prompt_encoder

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SamConfig:
    vision: image_encoder.SamVisionConfig = dataclasses.field(
        default_factory=image_encoder.SamVisionConfig
    )
    prompt: prompt_encoder.SamPromptConfig = dataclasses.field(
        default_factory=prompt_encoder.SamPromptConfig
    )
    decoder: mask_decoder.SamDecoderConfig = dataclasses.field(
        default_factory=mask_decoder.SamDecoderConfig
    )

    @classmethod
    def tiny(cls) -> "SamConfig":
        return cls(
            vision=image_encoder.SamVisionConfig.tiny(),
            prompt=prompt_encoder.SamPromptConfig.tiny(),
            decoder=mask_decoder.SamDecoderConfig.tiny(),
        )


def sam_vit_h(dtype=jnp.bfloat16) -> SamConfig:
    """ViT-H: embed 1280, depth 32, heads 16, global [7,15,23,31]
    (reference `build_sam.py:15-24`)."""
    return SamConfig(
        vision=image_encoder.SamVisionConfig(
            embed_dim=1280, depth=32, num_heads=16,
            global_attn_indexes=(7, 15, 23, 31), dtype=dtype,
        )
    )


def sam_vit_l(dtype=jnp.bfloat16) -> SamConfig:
    return SamConfig(
        vision=image_encoder.SamVisionConfig(
            embed_dim=1024, depth=24, num_heads=16,
            global_attn_indexes=(5, 11, 17, 23), dtype=dtype,
        )
    )


def sam_vit_b(dtype=jnp.bfloat16) -> SamConfig:
    return SamConfig(
        vision=image_encoder.SamVisionConfig(
            embed_dim=768, depth=12, num_heads=12,
            global_attn_indexes=(2, 5, 8, 11), dtype=dtype,
        )
    )


def init_sam_params(rng: jax.Array, cfg: SamConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "image_encoder": image_encoder.init_params(k1, cfg.vision),
        "prompt_encoder": prompt_encoder.init_params(k2, cfg.prompt),
        "mask_decoder": mask_decoder.init_params(k3, cfg.decoder),
    }


def preprocess(pixel_values: jax.Array, img_size: int = 1024) -> jax.Array:
    """[B, H, W, 3] uint8/float RGB -> normalized, zero-padded to square
    (reference `sam.py:174-184`). H, W must be <= img_size (host resizes
    the longest side first; `utils/transforms.py` equivalent lives in
    `ullava_tpu/data/tools`)."""
    x = pixel_values.astype(jnp.float32)
    mean = jnp.asarray(SAM_MEAN)
    std = jnp.asarray(SAM_STD)
    x = (x - mean) / std
    B, H, W, _ = x.shape
    return jnp.pad(x, ((0, 0), (0, img_size - H), (0, img_size - W), (0, 0)))


def upscale_masks_to_frame(low_res_masks: jax.Array, img_size: int = 1024) -> jax.Array:
    """[B, M, h, w] logits -> bilinear resize to the padded [img_size]^2
    frame (static-shape half of the reference's postprocess_masks)."""
    B, M, h, w = low_res_masks.shape
    out = jax.image.resize(
        low_res_masks.astype(jnp.float32), (B, M, img_size, img_size), method="bilinear"
    )
    return out


def postprocess_masks_host(
    low_res_masks: np.ndarray,  # [M, h, w] logits for ONE sample
    input_size: Tuple[int, int],  # pre-pad resized (H, W)
    original_size: Tuple[int, int],
    img_size: int = 1024,
) -> np.ndarray:
    """Host-side exact equivalent of `Sam.postprocess_masks` for eval:
    upscale to frame, crop padding, resize to original resolution."""
    m = jnp.asarray(low_res_masks)[None]
    up = jax.image.resize(
        m.astype(jnp.float32), (1, m.shape[1], img_size, img_size), "bilinear"
    )[0, :, : input_size[0], : input_size[1]]
    out = jax.image.resize(
        up, (m.shape[1],) + tuple(original_size), "bilinear"
    )
    return np.asarray(out)


def forward_masks(
    params: Params,
    cfg: SamConfig,
    image_embeddings: jax.Array,  # [B, g, g, D] from encode()
    text_embeds: jax.Array,  # [B, N, D] projected [SEG] states
    multimask_output: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Prompt-encode text embeddings and decode masks.

    Each text embedding must be its own prompt (one mask per [SEG] token),
    so N text tokens are folded into the batch axis: the reference loops
    `prompt_encoder(text_embeds=emb.unsqueeze(1))` per embedding
    (`models/ullava.py:231-256`); here it is one batched call.
    Returns (low_res_masks [B, N, 4g, 4g], iou_pred [B, N]).
    """
    B, N, D = text_embeds.shape
    g = cfg.prompt.image_embedding_size

    flat_text = text_embeds.reshape(B * N, 1, D)
    sparse, dense = prompt_encoder.encode_prompts(
        params["prompt_encoder"], cfg.prompt, batch=B * N, text_embeds=flat_text
    )
    image_pe = prompt_encoder.dense_positional_embedding(params["prompt_encoder"], cfg.prompt)
    img = jnp.repeat(image_embeddings, N, axis=0)  # [B*N, g, g, D]
    low_res, iou = mask_decoder.decode_masks(
        params["mask_decoder"], cfg.decoder, img, image_pe, sparse, dense,
        multimask_output=multimask_output,
    )
    M = low_res.shape[1]
    return (
        low_res.reshape(B, N * M, low_res.shape[2], low_res.shape[3]),
        iou.reshape(B, N * M),
    )
