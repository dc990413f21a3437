"""End-to-end entry points on synthetic data with tiny random models."""

import json
import sys

import numpy as np
import pytest
from PIL import Image

from ullava_tpu.config import Config
from ullava_tpu.constants import MM_TOKENS
import ullava_tpu.models.build  # noqa: F401  (registers archs)

from toy_tokenizer import ToyLlamaTokenizer

sys.path.insert(0, "/root/repo")


@pytest.fixture
def synthetic_stage2(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (40, 60, 3), np.uint8)
        ).save(img_dir / f"img{i}.jpg")
    res_anno = [
        {
            "image_path": f"img{i}.jpg",
            "segmentation": [[5, 5, 30, 5, 30, 25, 5, 25]],
            "category": "Widget",
            "bbox": [5, 5, 25, 20],
            "height": 40,
            "width": 60,
            "sentences": [f"widget {i}"],
        }
        for i in range(8)
    ]
    with open(tmp_path / "res.jsonl", "w") as f:
        for a in res_anno:
            f.write(json.dumps(a) + "\n")
    (tmp_path / "SEG.json").write_text(json.dumps(["<image> Where is the <class>?"]))
    return tmp_path


def _stage2_cfg(root, out_dir):
    ds = {
        "data_type": "image",
        "image_token_len": 4,
        "sam_image_size": 64,
        "vis_processor": "clip_image",
        "build_info": {
            "anno_dir": str(root / "res.jsonl"),
            "image_dir": str(root / "images"),
            "template_root": str(root / "SEG.json"),
        },
    }
    return Config(cfg_dict={
        "model": {
            "arch": "ullava",
            "conv_type": "conv_sep2",
            "projector_from_scratch": False,
        },
        "task": {"type": "image_text_pretrain", "collator_type": "grounding_collator"},
        "processor": {"clip_image": {"image_size": 28}},
        "dataset": {"refcoco": dict(ds)},
        "eval_dataset": {"refcoco_val": dict(ds)},
        "training": {
            "output_dir": str(out_dir),
            "learning_rate": 1e-3,
            "model_max_length": 128,
            "per_device_train_batch_size": 1,
            "num_train_epochs": 1,
            "evaluation_strategy": "no",
            "logging_steps": 1,
            "save_steps": 100,
            "save_total_limit": 1,
            "dataloader_num_workers": 2,
        },
    })


def test_train_ullava_stage2_end_to_end(synthetic_stage2, tmp_path):
    import train_ullava

    tok = ToyLlamaTokenizer(model_max_length=128)
    tok.add_tokens(MM_TOKENS)
    cfg = _stage2_cfg(synthetic_stage2, tmp_path / "exp")
    state = train_ullava.train(cfg, tokenizer=tok)
    assert int(state.step) >= 1


def test_eval_ullava_end_to_end(synthetic_stage2, tmp_path):
    import eval_ullava

    tok = ToyLlamaTokenizer(model_max_length=128)
    tok.add_tokens(MM_TOKENS)
    cfg = _stage2_cfg(synthetic_stage2, tmp_path / "eval_out")
    results = eval_ullava.evaluate(cfg, tokenizer=tok, max_samples=2)
    assert "refcoco_val" in results
    m = results["refcoco_val"]
    assert set(m) >= {"ciou", "giou", "prec@0.5"}
    assert m["n_masks"] > 0
    assert np.isfinite(m["ciou"])


def test_train_ullava_core_end_to_end(tmp_path):
    import train_ullava_core

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), np.uint8)
        ).save(img_dir / f"i{i}.jpg")
    anno = [
        {
            "image": f"i{i}.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nDescribe ."},
                {"from": "gpt", "value": f"Thing {i} ."},
            ],
        }
        for i in range(8)
    ]
    (tmp_path / "chat.json").write_text(json.dumps(anno))

    cfg = Config(cfg_dict={
        "model": {"arch": "ullava_core", "conv_type": "conv_simple",
                  "projector_from_scratch": True},
        "task": {"type": "image_text_pretrain",
                 "collator_type": "image_video_collator"},
        "processor": {"clip_image": {"image_size": 28}},
        "dataset": {
            "llava_cc3m": {
                "data_type": "image",
                "image_token_len": 4,
                "vis_processor": "clip_image",
                "build_info": {
                    "anno_dir": str(tmp_path / "chat.json"),
                    "image_dir": str(img_dir),
                },
            }
        },
        "training": {
            "output_dir": str(tmp_path / "exp1"),
            "learning_rate": 1e-3,
            "model_max_length": 64,
            "per_device_train_batch_size": 1,
            "num_train_epochs": 1,
            "logging_steps": 1,
            "save_steps": 100,
            "dataloader_num_workers": 2,
        },
    })
    tok = ToyLlamaTokenizer(model_max_length=64)
    state = train_ullava_core.train(cfg, tokenizer=tok)
    assert int(state.step) >= 1


def test_build_ullava_restores_pretrained_checkpoint(tmp_path):
    """build_ullava(pretrained_ullava=...) restores an orbax export."""
    import jax
    import jax.numpy as jnp

    from ullava_tpu.models import build as model_build
    from ullava_tpu.training import checkpoint as ckpt

    tok = ToyLlamaTokenizer(model_max_length=64)
    tok.add_tokens(MM_TOKENS)
    model_cfg = {"arch": "ullava", "conv_type": "conv_sep2"}
    cfg, params = model_build.build_ullava(model_cfg, tok, rng=jax.random.PRNGKey(3))

    # perturb a head weight, save, rebuild from the checkpoint
    params["seg_projector"]["fc0"]["w"] = (
        params["seg_projector"]["fc0"]["w"] + 1.5
    )
    out = str(tmp_path / "full")
    ckpt.save_checkpoint(out, 7, params)

    tok2 = ToyLlamaTokenizer(model_max_length=64)
    tok2.add_tokens(MM_TOKENS)
    cfg2, params2 = model_build.build_ullava(
        {**model_cfg, "pretrained_ullava": out + "/checkpoint-7"},
        tok2, rng=jax.random.PRNGKey(99),  # different rng: must be overwritten
    )
    np.testing.assert_allclose(
        np.asarray(params2["seg_projector"]["fc0"]["w"]),
        np.asarray(params["seg_projector"]["fc0"]["w"]),
        atol=1e-6,
    )


def test_build_from_hf_checkpoint_dirs(tmp_path):
    """Production path: llm_path/vision_encoder point at HF checkpoint
    dirs on disk (config.json + safetensors); weights convert and the
    model's logits match the torch original."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from transformers import (
        CLIPVisionConfig as HFCLIPCfg,
        CLIPVisionModel,
        LlamaConfig as HFLlamaCfg,
        LlamaForCausalLM,
    )

    from ullava_tpu.models import build as model_build, ullava_core

    torch.manual_seed(0)
    hf_llama = LlamaForCausalLM(HFLlamaCfg(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, attn_implementation="eager",
    )).eval()
    llm_dir = tmp_path / "llm"
    hf_llama.save_pretrained(llm_dir)

    hf_clip = CLIPVisionModel(HFCLIPCfg(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        attn_implementation="eager",
    )).eval()
    vis_dir = tmp_path / "vis"
    hf_clip.save_pretrained(vis_dir)

    tok = ToyLlamaTokenizer(model_max_length=64)
    # vocab smaller than embedding table: resize becomes a no-op
    cfg, params = model_build.build_ullava_core(
        {"llm_path": str(llm_dir), "vision_encoder": str(vis_dir),
         "vision_hidden_layer": -2, "conv_type": "conv_simple"},
        tok, dtype=jnp.float32,
    )
    assert cfg.llm.num_layers == 2
    assert cfg.vision.num_layers == 3

    ids = np.arange(10, dtype=np.int32)[None]
    with torch.no_grad():
        ref = hf_llama(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    from ullava_tpu.models import llama as llama_mod

    got = llama_mod.forward(params["llm"], cfg.llm, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got["logits"])[..., :128], ref, atol=3e-4, rtol=3e-4
    )


def test_train_ullava_stage2_lora_end_to_end(synthetic_stage2, tmp_path):
    """LoRA variant of the stage-2 entry: adapters train, base frozen."""
    import train_ullava

    tok = ToyLlamaTokenizer(model_max_length=128)
    tok.add_tokens(MM_TOKENS)
    cfg = _stage2_cfg(synthetic_stage2, tmp_path / "exp_lora")
    cfg.config["model"]["lora_r"] = 4
    cfg.config["model"]["lora_alpha"] = 8
    state = train_ullava.train(cfg, tokenizer=tok)
    assert int(state.step) >= 1
    layers = state.params["core"]["llm"]["layers"]
    assert "q_proj_lora_a" in layers and "v_proj_lora_b" in layers
