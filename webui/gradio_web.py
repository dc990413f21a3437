"""Gradio web demo (parity: `/root/reference/webui/gradio_web.py`).

Launch: python webui/gradio_web.py --cfg_path configs/eval/eval_all.yaml
Gradio is optional in this environment; the script degrades to a clear
error message when it is unavailable. `Chat.seg` (gradio_chat.py) is the
authoritative serving path either way.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_demo(cfg):
    try:
        import gradio as gr
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use webui.gradio_chat.Chat "
            "programmatically or the inference_ullava.py CLI instead."
        )

    import numpy as np

    from webui.gradio_chat import Chat

    chat = Chat(cfg)

    def inference(image, query, temperature, top_p, max_tokens):
        out = chat.seg(
            np.asarray(image), query, temperature=temperature,
            top_p=top_p or None, max_new_tokens=int(max_tokens),
        )
        overlays = []
        img = np.asarray(image)
        for m in out["masks"]:
            ov = img.copy()
            ov[m > 0] = ov[m > 0] * 0.5 + np.array([255, 0, 0]) * 0.5
            overlays.append(ov.astype(np.uint8))
        return out["text"], overlays

    with gr.Blocks(title="u-LLaVA TPU") as demo:
        gr.Markdown("# u-LLaVA (TPU-native)\nchat + segmentation + grounding")
        with gr.Row():
            with gr.Column():
                image = gr.Image(type="numpy", label="Image")
                query = gr.Textbox(label="Instruction")
                temperature = gr.Slider(0.0, 1.0, value=0.2, label="temperature")
                top_p = gr.Slider(0.0, 1.0, value=0.9, label="top_p")
                max_tokens = gr.Slider(8, 512, value=64, step=8, label="max new tokens")
                btn = gr.Button("Submit")
            with gr.Column():
                answer = gr.Textbox(label="Answer")
                gallery = gr.Gallery(label="Masks")
        btn.click(inference, [image, query, temperature, top_p, max_tokens],
                  [answer, gallery])
    return demo


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", required=True)
    parser.add_argument("--server_name", default="0.0.0.0")
    parser.add_argument("--server_port", type=int, default=7860)
    args = parser.parse_args()

    from ullava_tpu.config import Config
    import ullava_tpu.models.build  # noqa: F401

    demo = init_demo(Config(args.cfg_path))
    demo.launch(server_name=args.server_name, server_port=args.server_port)
