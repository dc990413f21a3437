"""Full CLI subprocess test: `python train_ullava_core.py --cfg_path ...`
exactly as a user runs it — real HF fast tokenizer from disk, real tiny
HF llama/CLIP checkpoints, synthetic dataset, the whole entry path."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = "/root/repo"


@pytest.fixture
def workspace(tmp_path):
    torch = pytest.importorskip("torch")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (
        CLIPVisionConfig as HFCLIPCfg,
        CLIPVisionModel,
        LlamaConfig as HFLlamaCfg,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    # tiny llama checkpoint + fast tokenizer in the same dir (HF layout)
    llm_dir = tmp_path / "llm"
    torch.manual_seed(0)
    LlamaForCausalLM(HFLlamaCfg(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256,
    )).save_pretrained(llm_dir)

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, "[PAD]": 3}
    for w in ["Describe", "the", "image", ".", "A", "thing", "number",
              "0", "1", "2", "3", "4", "5", "6", "7", "What", "is", "this", "?"]:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="[PAD]",
    ).save_pretrained(llm_dir)

    vis_dir = tmp_path / "vis"
    CLIPVisionModel(HFCLIPCfg(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )).save_pretrained(vis_dir)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    anno = []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"i{i}.jpg"
        )
        anno.append({
            "image": f"i{i}.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is this ?"},
                {"from": "gpt", "value": f"A thing number {i} ."},
            ],
        })
    (tmp_path / "chat.json").write_text(json.dumps(anno))

    cfg = {
        "model": {
            "arch": "ullava_core",
            "llm_path": str(llm_dir),
            "vision_encoder": str(vis_dir),
            "vision_hidden_layer": -2,
            "projector_from_scratch": True,
            "conv_type": "conv_simple",
        },
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
            "output_dir": str(tmp_path / "exp"),
            "learning_rate": 1e-3,
            "model_max_length": 64,
            "per_device_train_batch_size": 1,
            "num_train_epochs": 1,
            "logging_steps": 1,
            "save_steps": 100,
            "dataloader_num_workers": 2,
        },
    }
    import yaml

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return tmp_path, cfg_path


def test_train_ullava_core_cli_subprocess(workspace):
    tmp_path, cfg_path = workspace
    env = {**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"}
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_ullava_core.py"),
         "--cfg_path", str(cfg_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "training complete" in result.stderr or "training complete" in result.stdout
    # final checkpoint written
    exp = tmp_path / "exp"
    ckpts = [d for d in os.listdir(exp) if d.startswith("checkpoint-")]
    assert ckpts, list(os.listdir(exp))
