"""Stage-2 interactive inference CLI (RES / REC / salient seg chat).

Usage (reference-compatible, `/root/reference/inference_ullava.py`):
    python inference_ullava.py --cfg_path <yaml> --image <path> \
        --query "Segment the dog." [--save_dir ./vis]

Dual preprocessing (CLIP 224 pad + SAM 1024), generate + [SEG]/[LOC]
readout, SAM decode, host postprocess; saves binary mask, overlay, and
bbox renders; boxes are denormalized from the padded square.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("inference_ullava")


def run_once(cfg, image_path, query, temperature=0.2, top_p=None,
             max_new_tokens=64, save_dir=None, tokenizer=None):
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ullava_tpu.conversation import conversation_lib
    from ullava_tpu.data.processors import CLIPProcessor
    from ullava_tpu.data.tools.mask_toolbox import DetToolBox, SegToolBox
    from ullava_tpu.models import build as model_build
    from ullava_tpu.models import ullava
    from ullava_tpu.models.generate import GenerateConfig
    from ullava_tpu.models.sam.build import postprocess_masks_host
    from ullava_tpu.models.tools import keyword_stop_ids
    from ullava_tpu.tokenization import preprocess_image_text

    model_cfg = cfg.model_cfg
    if tokenizer is None:
        tokenizer = model_build.build_tokenizer(model_cfg.get("llm_path"))
    u_cfg, params = model_build.build_ullava(model_cfg, tokenizer)
    core_cfg = u_cfg.core

    conv_type = model_cfg.get("conv_type", "conv_sep2")
    src = [{"from": "human", "value": f"<image>\n{query}"}]
    preprocess_image_text(src, cur_token_len=core_cfg.vision.num_patches)
    conv = conversation_lib[conv_type].copy()
    conv.append_message(conv.roles[0], src[0]["value"])
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    ids = np.asarray(tokenizer(prompt)["input_ids"], np.int32)

    image = np.asarray(Image.open(image_path).convert("RGB"))
    height, width = image.shape[:2]
    clip_proc = CLIPProcessor(image_size=core_cfg.vision.image_size, aspect_ratio="pad")
    image_clip = clip_proc(image)
    seg_tool = SegToolBox(sam_size=u_cfg.sam.vision.img_size)
    resized = seg_tool.apply_image(image)
    resize = resized.shape[:2]
    image_sam = seg_tool.preprocess(resized)

    stops = keyword_stop_ids(tokenizer, [conv.sep2 or conv.sep])
    out = ullava.evaluate(
        params, u_cfg,
        GenerateConfig(max_new_tokens=max_new_tokens, temperature=temperature,
                       top_p=top_p, stop_token_ids=stops,
                       vocab_size=len(tokenizer)),
        input_ids=jnp.asarray(ids[None]),
        prompt_lens=jnp.asarray([len(ids)], np.int32),
        images=jnp.asarray(image_clip[None]),
        images_sam=jnp.asarray(image_sam[None]),
    )

    T = int(out["lengths"][0])
    text = tokenizer.decode(
        np.asarray(out["sequences"][0, len(ids):T]), skip_special_tokens=True
    ).strip()

    det_tool = DetToolBox()
    results = {"text": text, "masks": [], "boxes": []}
    n_seg = int(np.asarray(out["seg_valid"][0]).sum())
    if n_seg:
        low = np.asarray(out["low_res_masks"][0, :n_seg])
        masks = postprocess_masks_host(
            low, input_size=resize, original_size=(height, width),
            img_size=u_cfg.sam.vision.img_size,
        )
        results["masks"] = [(m > 0).astype(np.uint8) for m in masks]
    n_loc = int(np.asarray(out["loc_valid"][0]).sum())
    for j in range(n_loc):
        box = det_tool.denormalize_padded_xyxy(
            np.asarray(out["pred_boxes"][0, j]), width, height
        )
        results["boxes"].append(box)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        import cv2

        for i, m in enumerate(results["masks"]):
            cv2.imwrite(os.path.join(save_dir, f"mask_{i}.png"), m * 255)
            overlay = image.copy()
            overlay[m > 0] = overlay[m > 0] * 0.5 + np.array([255, 0, 0]) * 0.5
            cv2.imwrite(
                os.path.join(save_dir, f"overlay_{i}.png"),
                cv2.cvtColor(overlay.astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
        if results["boxes"]:
            canvas = cv2.cvtColor(image.copy(), cv2.COLOR_RGB2BGR)
            for box in results["boxes"]:
                x0, y0, x1, y1 = [int(v) for v in box]
                cv2.rectangle(canvas, (x0, y0), (x1, y1), (0, 0, 255), 2)
            cv2.imwrite(os.path.join(save_dir, "bbox.png"), canvas)
        logger.info("saved visualizations to %s", save_dir)

    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--query", required=True)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--max_new_tokens", type=int, default=64)
    parser.add_argument("--save_dir", default="./vis")
    args = parser.parse_args()

    from ullava_tpu.config import Config
    import ullava_tpu.models.build  # noqa: F401

    res = run_once(Config(args.cfg_path), args.image, args.query,
                   args.temperature, args.top_p, args.max_new_tokens,
                   args.save_dir)
    print("ASSISTANT:", res["text"])
    print(f"{len(res['masks'])} masks, {len(res['boxes'])} boxes")
