"""Tests for registry, config, conversation templating, and tokenization."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from ullava_tpu.config import Config, ConfigNode
from ullava_tpu.constants import IGNORE_INDEX
from ullava_tpu.conversation import (
    SeparatorStyle,
    conversation_lib,
    default_conversation,
)
from ullava_tpu.registry import Registry
from ullava_tpu.tokenization import (
    preprocess,
    preprocess_image_text,
    preprocess_sep1,
    preprocess_sep2,
    preprocess_video_text,
)

from toy_tokenizer import ToyLlamaTokenizer

REFERENCE = "/root/reference"


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------
def test_registry_roundtrip():
    reg = Registry()

    @reg.register_model("m1")
    class M1:
        pass

    @reg.register_processor("p1")
    class P1:
        pass

    assert reg.get_model_class("m1") is M1
    assert reg.get_processor_class("p1") is P1
    assert reg.get_model_class("nope") is None
    reg.register("answer", 42)
    assert reg.get("answer") == 42
    assert reg.get("missing", default="d") == "d"


def test_registry_rejects_duplicate():
    reg = Registry()

    @reg.register_task("t")
    class T1:
        pass

    with pytest.raises(KeyError):

        @reg.register_task("t")
        class T2:
            pass


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------
CFG = {
    "model": {"arch": None, "llm_path": "x", "conv_type": "conv_simple"},
    "task": {"type": "image_text_pretrain", "collator_type": "image_collator"},
    "processor": {"clip_image": {"image_size": 224}},
    "dataset": {"llava_cc3m": {"data_type": "image", "build_info": {"portion": 1.0}}},
    "training": {"learning_rate": 2e-3, "bf16": True},
}


def test_config_assign():
    cfg = Config(cfg_dict=CFG)
    model, dataset, eval_ds, training, task, processor = cfg.assign_config()
    assert model.llm_path == "x"
    assert dataset.llava_cc3m.build_info.portion == 1.0
    assert dict(eval_ds) == {}
    assert training.learning_rate == 2e-3
    assert task.type == "image_text_pretrain"
    assert processor.clip_image.image_size == 224


def test_config_missing_keys():
    bad = {k: v for k, v in CFG.items() if k != "training"}
    with pytest.raises(KeyError):
        Config(cfg_dict=bad)
    with pytest.raises(KeyError):
        Config(cfg_dict={**CFG, "model": {"arch": "not_registered"}})


def test_confignode_merge_and_dict():
    node = ConfigNode({"a": {"b": 1}, "c": 2})
    node.merge_from({"a": {"d": 3}})
    assert node.to_dict() == {"a": {"b": 1, "d": 3}, "c": 2}


# --------------------------------------------------------------------------
# Conversation
# --------------------------------------------------------------------------
def test_conv_simple_prompt():
    conv = conversation_lib["conv_simple"].copy()
    conv.append_message(conv.roles[0], "Describe the image.")
    conv.append_message(conv.roles[1], "Sure, it is a dog.")
    assert conv.get_prompt() == (
        "###Human: Describe the image.###Assistant: Sure, it is a dog.###"
    )
    conv.append_message(conv.roles[0], "Thanks")
    conv.append_message(conv.roles[1], None)  # generation prefix
    assert conv.get_prompt().endswith("###Human: Thanks###Assistant:")


def test_conv_sep2_prompt():
    conv = conversation_lib["conv_sep2"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "hello")
    expected = conv.system + " " + "USER: hi ASSISTANT: hello</s>"
    assert conv.get_prompt() == expected
    assert default_conversation.sep_style is SeparatorStyle.TWO


def test_conv_llama2_prompt():
    conv = conversation_lib["conv_llama2"].copy()
    conv.append_message(conv.roles[0], "hi")
    conv.append_message(conv.roles[1], "hello")
    prompt = conv.get_prompt()
    assert prompt.startswith("[INST] <<SYS>>\n")
    assert prompt.endswith(" [/INST] hello</s>")


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
@pytest.mark.parametrize("name", ["conv_simple", "conv_sep2", "conv_llama2"])
def test_conversation_parity_with_reference(name):
    """Golden check: rendered prompts match the reference byte-for-byte."""
    spec = importlib.util.spec_from_file_location(
        "ref_conversation", os.path.join(REFERENCE, "utils/conversation.py")
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    turns = [
        ("u", "Describe <image> please."),
        ("a", "Sure. Mask: [SEG]; Location: [LOC]; [tag]dog[/tag]."),
        ("u", "Why?"),
        ("a", "Because."),
    ]
    ref_conv = ref.conversation_lib[name].copy()
    our_conv = conversation_lib[name].copy()
    for who, text in turns:
        idx = 0 if who == "u" else 1
        ref_conv.append_message(ref_conv.roles[idx], text)
        our_conv.append_message(our_conv.roles[idx], text)
    assert our_conv.get_prompt() == ref_conv.get_prompt()
    # And with an empty trailing assistant slot (generation mode).
    if name != "conv_llama2":
        ref_conv.append_message(ref_conv.roles[0], "more")
        ref_conv.append_message(ref_conv.roles[1], None)
        our_conv.append_message(our_conv.roles[0], "more")
        our_conv.append_message(our_conv.roles[1], None)
        assert our_conv.get_prompt() == ref_conv.get_prompt()


# --------------------------------------------------------------------------
# Tokenization / label masking
# --------------------------------------------------------------------------
def _source():
    return [
        {"from": "human", "value": "What is in the picture ?"},
        {"from": "gpt", "value": "A small dog ."},
        {"from": "human", "value": "What color ?"},
        {"from": "gpt", "value": "Brown ."},
    ]


def test_preprocess_sep1_masks_human_turns():
    tok = ToyLlamaTokenizer()
    out = preprocess_sep1([_source()], tok, "conv_simple")
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids.shape == labels.shape
    assert labels[0] == IGNORE_INDEX  # header masked
    # Answer words must be unmasked somewhere.
    dog_id = tok.convert_tokens_to_ids("dog")
    assert (labels == dog_id).any()
    # Human content words must be masked.
    picture_id = tok.convert_tokens_to_ids("picture")
    assert not (labels == picture_id).any()
    assert (ids == picture_id).any()


def test_preprocess_sep2_masks_instructions_exactly():
    tok = ToyLlamaTokenizer()
    out = preprocess_sep2([_source()], tok, "conv_sep2")
    ids, labels = out["input_ids"][0], out["labels"][0]
    # No mismatch-null: labels must retain unmasked answer tokens.
    assert (labels != IGNORE_INDEX).any(), "mismatch guard fired on toy tokenizer"
    dog_id = tok.convert_tokens_to_ids("dog")
    brown_id = tok.convert_tokens_to_ids("Brown")
    picture_id = tok.convert_tokens_to_ids("picture")
    assert (labels == dog_id).any()
    assert (labels == brown_id).any()
    assert not (labels == picture_id).any()
    assert (ids == picture_id).any()
    # The trailing </s> of each round is predictable (unmasked).
    eos_positions = np.where(ids == tok.eos_token_id)[0]
    assert len(eos_positions) == 2
    assert all(labels[p] == tok.eos_token_id for p in eos_positions)


def test_preprocess_sep2_mismatch_guard():
    class BrokenTok(ToyLlamaTokenizer):
        def __call__(self, text, **kw):
            out = super().__call__(text, **kw)
            if "ASSISTANT" in text and "USER" in text and "curious" not in text:
                out["input_ids"] = out["input_ids"] + [99]  # corrupt round len
            return out

    out = preprocess_sep2([_source()], BrokenTok(), "conv_sep2")
    assert (out["labels"][0] == IGNORE_INDEX).all()


def test_preprocess_dispatch():
    tok = ToyLlamaTokenizer()
    a = preprocess([_source()], tok, "conv_simple")
    b = preprocess([_source()], tok, "conv_sep2")
    assert not np.array_equal(a["input_ids"][0], b["input_ids"][0])


def test_preprocess_image_text_moves_image_first():
    conv = [{"from": "human", "value": "Describe it. <image>"}, {"from": "gpt", "value": "ok"}]
    out = preprocess_image_text(conv, cur_token_len=4)
    v = out[0][0]["value"]
    assert v.startswith("<img_beg><image_patch><image_patch><image_patch><image_patch></img_end>")
    assert "Describe it." in v
    assert "<image>" not in v


def test_preprocess_video_text_appends_patches():
    conv = [{"from": "human", "value": "What happens?"}]
    out = preprocess_video_text(conv, cur_token_len=3)
    v = out[0][0]["value"]
    assert v == "What happens?<vid_beg><video_patch><video_patch><video_patch></vid_end>"


def test_preprocess_sep2_fuzz_round_structures():
    """Random multi-round conversations keep the additive-token invariant:
    answers unmasked, instructions masked, no mismatch-null."""
    rng = np.random.default_rng(0)
    tok = ToyLlamaTokenizer()
    words = ["alpha", "beta", "gamma", "delta", "x", "y", "zeta"]
    for trial in range(10):
        n_rounds = int(rng.integers(1, 5))
        src = []
        for r in range(n_rounds):
            q = " ".join(rng.choice(words, size=rng.integers(1, 6)))
            a = " ".join(rng.choice(words, size=rng.integers(1, 6)))
            src.append({"from": "human", "value": q})
            src.append({"from": "gpt", "value": a})
        out = preprocess_sep2([src], tok, "conv_sep2")
        labels = out["labels"][0]
        assert (labels != IGNORE_INDEX).any(), f"trial {trial} nulled"
        # every round's eos is predictable
        ids = out["input_ids"][0]
        eos_count = int((ids == tok.eos_token_id).sum())
        assert eos_count == n_rounds
