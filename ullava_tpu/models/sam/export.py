"""Portable serving-artifact export for the SAM prompt+mask decoder.

TPU-native counterpart of the reference's ONNX export wrapper
(`/root/reference/models/segment_anything/utils/onnx.py`, SamOnnxModel):
the same combined computation — point prompt embedding with -1 padding
labels, gated mask-prompt embedding, mask decoding, the multi-click
single-mask selection trick (score reweighting instead of control flow,
`onnx.py:105-119`), optional stability scores — as ONE jittable pure
function, serialized with `jax.export` (StableHLO) instead of ONNX.
StableHLO is the portable deployment format of the XLA ecosystem: the
artifact reloads with `jax.export.deserialize` and runs on any backend
the export was lowered for, with no Python model code.

One deliberate divergence, consistent with this repo's serving contract:
the reference's `mask_postprocessing` resizes to the ORIGINAL image size
with dynamic shapes (`onnx.py:85-103`); XLA compiles static shapes, so
the artifact returns masks upscaled to the fixed padded frame
(`build.upscale_masks_to_frame`) and the exact crop/resize to the
original size stays on the host (`build.postprocess_masks_host`), same
as the in-process serving path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ullava_tpu.models.sam import build as sam_build
from ullava_tpu.models.sam import mask_decoder, prompt_encoder

Params = Dict[str, Any]


def stability_score_jnp(
    logits: jax.Array, threshold: float = 0.0, offset: float = 1.0
) -> jax.Array:
    """IoU between the mask binarized at threshold+/-offset (jnp version
    of `automatic.stability_score`; reference `utils/amg.py`
    calculate_stability_score)."""
    hi = (logits > threshold + offset).sum(axis=(-1, -2)).astype(jnp.float32)
    lo = (logits > threshold - offset).sum(axis=(-1, -2)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1.0)


def make_decoder_fn(
    params: Params,  # {"prompt_encoder": ..., "mask_decoder": ...}
    cfg,  # SamConfig
    *,
    return_single_mask: bool = True,
    use_stability_score: bool = False,
    upscale_to_frame: bool = True,
):
    """Builds the exportable pure function.

    fn(image_embeddings [B, g, g, D], point_coords [B, N, 2] f32 pixels,
       point_labels [B, N] i32 in {-1, 0, 1} (-1 = padding, as the
       reference's ONNX caller supplies), mask_input [B, 4g, 4g, 1] f32,
       has_mask_input [B] f32 in {0., 1.})
      -> (masks, iou_scores, low_res_masks)

    Reference computation: `onnx.py:121-158` (SamOnnxModel.forward)."""
    pp = params["prompt_encoder"]
    dp = params["mask_decoder"]
    pcfg, dcfg = cfg.prompt, cfg.decoder

    def fn(image_embeddings, point_coords, point_labels, mask_input,
           has_mask_input):
        B = image_embeddings.shape[0]
        sparse = prompt_encoder._embed_points(
            pp, pcfg, point_coords, point_labels, pad=False
        )
        # Gated mask embedding (reference `onnx.py:74-84`): blend the
        # downscaled mask embedding with the no-mask embedding by the
        # has_mask flag — a static graph instead of control flow.
        _, dense_m = prompt_encoder.encode_prompts(
            pp, pcfg, batch=B, masks=mask_input
        )
        _, dense_0 = prompt_encoder.encode_prompts(pp, pcfg, batch=B)
        has = has_mask_input.reshape(B, 1, 1, 1).astype(dense_m.dtype)
        dense = has * dense_m + (1.0 - has) * dense_0

        image_pe = prompt_encoder.dense_positional_embedding(pp, pcfg)
        low_res, iou = mask_decoder.decode_masks(
            dp, dcfg, image_embeddings, image_pe, sparse, dense,
            return_all=True,
        )  # [B, M, 4g, 4g], [B, M]

        if use_stability_score:
            iou = stability_score_jnp(low_res)

        if return_single_mask:
            # Multi-click selection without control flow
            # (`onnx.py:105-119`): boost token 0's score by 1000 when
            # num_points <= 2 so argmax picks it, else pick the best
            # multimask token.
            num_points = point_labels.shape[1]
            reweight = jnp.zeros((dcfg.num_mask_tokens,), jnp.float32).at[
                0
            ].set(1000.0)
            score = iou.astype(jnp.float32) + (num_points - 2.5) * reweight
            best = jnp.argmax(score, axis=1)
            low_res = jnp.take_along_axis(
                low_res, best[:, None, None, None], axis=1
            )
            iou = jnp.take_along_axis(iou, best[:, None], axis=1)

        masks = (
            sam_build.upscale_masks_to_frame(low_res, cfg.vision.img_size)
            if upscale_to_frame
            else low_res
        )
        return masks, iou, low_res

    return fn


def export_sam_decoder(
    params: Params,
    cfg,
    *,
    batch: int = 1,
    num_points: int = 1,
    return_single_mask: bool = True,
    use_stability_score: bool = False,
    upscale_to_frame: bool = True,
) -> bytes:
    """Serialize the decoder function to a portable StableHLO artifact
    (bytes; write to a `.stablehlo` file for deployment). The prompt
    shapes are baked in, mirroring the ONNX export script's
    dynamic-axes-free usage."""
    from jax import export as jax_export

    g = cfg.prompt.image_embedding_size
    D = cfg.prompt.embed_dim
    fn = make_decoder_fn(
        params, cfg,
        return_single_mask=return_single_mask,
        use_stability_score=use_stability_score,
        upscale_to_frame=upscale_to_frame,
    )
    args = (
        jax.ShapeDtypeStruct((batch, g, g, D), cfg.decoder.dtype),
        jax.ShapeDtypeStruct((batch, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_points), jnp.int32),
        jax.ShapeDtypeStruct((batch, 4 * g, 4 * g, 1), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.float32),
    )
    exported = jax_export.export(jax.jit(fn))(*args)
    return exported.serialize()


def load_sam_decoder(blob: bytes):
    """Deserialize an exported artifact; returns a callable with the
    `make_decoder_fn` signature."""
    from jax import export as jax_export

    return jax_export.deserialize(blob).call
