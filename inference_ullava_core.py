"""Stage-1 interactive chat CLI (captioning / VQA).

Usage (reference-compatible, `/root/reference/inference_ullava_core.py`):
    python inference_ullava_core.py --cfg_path <yaml> --image <path> \
        [--query "Describe the image."] [--temperature 0.2] [--top_p 0.9]

Prompt templating + CLIP preprocess + jit generate with keyword stopping.
Without --query the script drops into a REPL.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(level=logging.INFO, format="%(message)s")
logger = logging.getLogger("inference_ullava_core")


def build_prompt(conv_type: str, query: str, image_token_len: int):
    from ullava_tpu.conversation import conversation_lib
    from ullava_tpu.tokenization import preprocess_image_text

    src = [{"from": "human", "value": f"<image>\n{query}"}]
    preprocess_image_text(src, cur_token_len=image_token_len)
    conv = conversation_lib[conv_type].copy()
    conv.append_message(conv.roles[0], src[0]["value"])
    conv.append_message(conv.roles[1], None)
    return conv


class CoreChat:
    """Stage-1 chat session: the model loads ONCE; each query re-runs
    only prompt build + generate (a per-query 7B rebuild would dominate
    the REPL)."""

    def __init__(self, cfg, tokenizer=None):
        from ullava_tpu.data.processors import CLIPProcessor
        from ullava_tpu.models import build as model_build

        model_cfg = cfg.model_cfg
        self.tokenizer = tokenizer or model_build.build_tokenizer(
            model_cfg.get("llm_path")
        )
        self.core_cfg, self.params = model_build.build_ullava_core(
            model_cfg, self.tokenizer
        )
        self.conv_type = model_cfg.get("conv_type", "conv_simple")
        self.proc = CLIPProcessor(
            image_size=self.core_cfg.vision.image_size, aspect_ratio="pad"
        )

    def ask(self, image_path, query, temperature=0.2, top_p=None,
            max_new_tokens=128):
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        from ullava_tpu.models import generate as gen_mod
        from ullava_tpu.models.tools import keyword_stop_ids

        conv = build_prompt(
            self.conv_type, query, self.core_cfg.vision.num_patches
        )
        prompt = conv.get_prompt()
        ids = np.asarray(self.tokenizer(prompt)["input_ids"], np.int32)
        image = self.proc(Image.open(image_path).convert("RGB"))

        stops = keyword_stop_ids(self.tokenizer, [conv.sep2 or conv.sep])
        gen = gen_mod.GenerateConfig(
            max_new_tokens=max_new_tokens, temperature=temperature, top_p=top_p,
            stop_token_ids=stops, vocab_size=len(self.tokenizer),
        )
        out = gen_mod.generate(
            self.params, self.core_cfg, gen,
            input_ids=jnp.asarray(ids[None]),
            prompt_lens=jnp.asarray([len(ids)], np.int32),
            images=jnp.asarray(image[None]),
        )
        T = int(out["lengths"][0])
        answer_ids = np.asarray(out["sequences"][0, len(ids):T])
        text = self.tokenizer.decode(answer_ids, skip_special_tokens=True).strip()
        for stop_str in ("###", conv.sep2 or ""):
            if stop_str and text.endswith(stop_str):
                text = text[: -len(stop_str)].strip()
        return text


def eval_model(cfg, image_path, query, temperature=0.2, top_p=None,
               max_new_tokens=128, tokenizer=None):
    """One-shot convenience wrapper (builds the model; use CoreChat for
    multi-turn sessions)."""
    return CoreChat(cfg, tokenizer=tokenizer).ask(
        image_path, query, temperature, top_p, max_new_tokens
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--query", default=None)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--max_new_tokens", type=int, default=128)
    args = parser.parse_args()

    from ullava_tpu.config import Config
    import ullava_tpu.models.build  # noqa: F401

    cfg = Config(args.cfg_path)
    chat = CoreChat(cfg)
    if args.query:
        print(chat.ask(args.image, args.query, args.temperature,
                       args.top_p, args.max_new_tokens))
    else:
        while True:
            try:
                query = input("USER: ").strip()
            except EOFError:
                break
            if not query or query in ("exit", "quit"):
                break
            print("ASSISTANT:", chat.ask(args.image, query, args.temperature,
                                         args.top_p, args.max_new_tokens))
