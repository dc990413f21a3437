"""Inference entry points: chat CLI (stage 1), seg/grounding CLI (stage 2),
webui Chat — end-to-end on tiny random models + synthetic images."""

import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/repo")

from ullava_tpu.config import Config
from ullava_tpu.constants import MM_TOKENS, STAGE2_TOKENS
import ullava_tpu.models.build  # noqa: F401

from toy_tokenizer import ToyLlamaTokenizer


def _cfg(arch):
    return Config(cfg_dict={
        "model": {"arch": arch, "conv_type": "conv_simple" if arch == "ullava_core" else "conv_sep2"},
        "task": {"type": "image_text_evaluate"},
        "processor": {},
        "training": {},
    })


def _tok():
    tok = ToyLlamaTokenizer(model_max_length=256)
    tok.add_tokens(MM_TOKENS)
    tok.add_tokens(STAGE2_TOKENS)
    return tok


@pytest.fixture
def image_file(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(path)
    return str(path)


def test_inference_ullava_core_cli(image_file):
    import inference_ullava_core as cli

    text = cli.eval_model(
        _cfg("ullava_core"), image_file, "Describe the image .",
        temperature=0.0, max_new_tokens=6, tokenizer=_tok(),
    )
    assert isinstance(text, str)  # random weights -> arbitrary tokens


def test_inference_ullava_cli_saves_artifacts(image_file, tmp_path):
    import inference_ullava as cli

    save_dir = str(tmp_path / "vis")
    res = cli.run_once(
        _cfg("ullava"), image_file, "Segment the widget .",
        temperature=0.0, max_new_tokens=6, save_dir=save_dir, tokenizer=_tok(),
    )
    assert isinstance(res["text"], str)
    assert isinstance(res["masks"], list)
    assert isinstance(res["boxes"], list)
    # masks at original resolution when present
    for m in res["masks"]:
        assert m.shape == (48, 64)


def test_webui_chat_seg(image_file):
    from webui.gradio_chat import Chat

    chat = Chat(_cfg("ullava"), tokenizer=_tok())
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 56, 3), np.uint8)
    out = chat.seg(img, "Find the thing .", temperature=0.0, max_new_tokens=5)
    assert set(out) == {"text", "masks", "boxes"}
    for m in out["masks"]:
        assert m.shape == (40, 56)
    # On-device preprocessing path: same text (greedy decode is robust to
    # the sub-pixel CLIP resampler difference on a tiny random model only
    # if the towers are identical; just assert the contract holds).
    out2 = chat.seg(img, "Find the thing .", temperature=0.0,
                    max_new_tokens=5, device_preprocess=True)
    assert set(out2) == {"text", "masks", "boxes"}
    for m in out2["masks"]:
        assert m.shape == (40, 56)


def test_quantized_serving_build(image_file):
    """model.quantize='int8' produces a servable quantized stack."""
    from ullava_tpu.config import Config
    from ullava_tpu.ops import quant
    from webui.gradio_chat import Chat

    cfg = Config(cfg_dict={
        "model": {"arch": "ullava", "conv_type": "conv_sep2", "quantize": "int8"},
        "task": {"type": "image_text_evaluate"},
        "processor": {}, "training": {},
    })
    chat = Chat(cfg, tokenizer=_tok())
    assert quant.is_quantized(chat.params["core"]["llm"]["layers"]["q_proj"])
    assert quant.is_quantized(chat.params["sam"]["image_encoder"]["window_blocks"]["qkv"])
    rng = np.random.default_rng(2)
    out = chat.seg(rng.integers(0, 255, (32, 48, 3), np.uint8),
                   "Segment .", temperature=0.0, max_new_tokens=4)
    assert isinstance(out["text"], str)
