"""Chat backend for the web UI.

Parity: `/root/reference/webui/gradio_chat.py:12-83` — `Chat.seg()` wraps
the same evaluate path as `inference_ullava.py` (prompt build -> dual
preprocess -> generate + [SEG]/[LOC] decode). This module is
gradio-independent so it is also the programmatic serving API.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class Chat:
    def __init__(self, cfg, tokenizer=None):
        from ullava_tpu.models import build as model_build

        self.cfg = cfg
        model_cfg = cfg.model_cfg
        self.tokenizer = tokenizer or model_build.build_tokenizer(
            model_cfg.get("llm_path")
        )
        self.u_cfg, self.params = model_build.build_ullava(model_cfg, self.tokenizer)
        self.conv_type = model_cfg.get("conv_type", "conv_sep2")

    def seg(self, image: np.ndarray, query: str, temperature: float = 0.2,
            top_p=None, max_new_tokens: int = 64,
            device_preprocess: bool = False):
        """image: RGB uint8 array. Returns dict(text, masks, boxes).

        device_preprocess=True ships one uint8 canvas and runs the CLIP
        white-pad/resize/normalize + SAM normalize/pad as XLA ops on the
        accelerator (`ops/image_ops.py`) — 4x less H2D traffic and no
        host float preprocess; the host keeps only jpeg-decode + one
        longest-side resize."""
        import jax.numpy as jnp

        from ullava_tpu.conversation import conversation_lib
        from ullava_tpu.data.processors import CLIPProcessor
        from ullava_tpu.data.tools.mask_toolbox import DetToolBox, SegToolBox
        from ullava_tpu.models import ullava
        from ullava_tpu.models.generate import GenerateConfig
        from ullava_tpu.models.sam.build import postprocess_masks_host
        from ullava_tpu.models.tools import keyword_stop_ids
        from ullava_tpu.tokenization import preprocess_image_text

        u_cfg, core_cfg = self.u_cfg, self.u_cfg.core
        src = [{"from": "human", "value": f"<image>\n{query}"}]
        preprocess_image_text(src, cur_token_len=core_cfg.vision.num_patches)
        conv = conversation_lib[self.conv_type].copy()
        conv.append_message(conv.roles[0], src[0]["value"])
        conv.append_message(conv.roles[1], None)
        ids = np.asarray(self.tokenizer(conv.get_prompt())["input_ids"], np.int32)

        height, width = image.shape[:2]
        seg_tool = SegToolBox(sam_size=u_cfg.sam.vision.img_size)
        if device_preprocess:
            import jax

            from ullava_tpu.ops import image_ops

            canvas, hw = image_ops.make_canvas(image, u_cfg.sam.vision.img_size)
            resize = hw
            images, images_sam = jax.jit(
                image_ops.preprocess_canvas, static_argnums=(2,)
            )(
                jnp.asarray(canvas[None]), jnp.asarray([hw], np.int32),
                core_cfg.vision.image_size,
            )
        else:
            clip_proc = CLIPProcessor(core_cfg.vision.image_size, aspect_ratio="pad")
            resized = seg_tool.apply_image(image)
            resize = resized.shape[:2]
            images = jnp.asarray(clip_proc(image)[None])
            images_sam = jnp.asarray(seg_tool.preprocess(resized)[None])

        out = ullava.evaluate(
            self.params, u_cfg,
            GenerateConfig(
                max_new_tokens=max_new_tokens, temperature=temperature,
                top_p=top_p,
                stop_token_ids=keyword_stop_ids(self.tokenizer, [conv.sep2 or conv.sep]),
                vocab_size=len(self.tokenizer),
            ),
            input_ids=jnp.asarray(ids[None]),
            prompt_lens=jnp.asarray([len(ids)], np.int32),
            images=images,
            images_sam=images_sam,
        )
        T = int(out["lengths"][0])
        text = self.tokenizer.decode(
            np.asarray(out["sequences"][0, len(ids):T]), skip_special_tokens=True
        ).strip()

        masks = []
        n_seg = int(np.asarray(out["seg_valid"][0]).sum())
        if n_seg:
            post = postprocess_masks_host(
                np.asarray(out["low_res_masks"][0, :n_seg]),
                input_size=resize, original_size=(height, width),
                img_size=u_cfg.sam.vision.img_size,
            )
            masks = [(m > 0).astype(np.uint8) for m in post]
        det_tool = DetToolBox()
        boxes = [
            det_tool.denormalize_padded_xyxy(
                np.asarray(out["pred_boxes"][0, j]), width, height
            )
            for j in range(int(np.asarray(out["loc_valid"][0]).sum()))
        ]
        return {"text": text, "masks": masks, "boxes": boxes}
