"""Video path end to end: GIF decode -> sampling -> TGIF dataset ->
video collator -> stage-1 forward with temporal+spatial pooling."""

import json

import imageio
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.config import ConfigNode
from ullava_tpu.constants import MM_TOKENS
from ullava_tpu.data.collators import VideoCollator
from ullava_tpu.data.loader import DataLoader
from ullava_tpu.data.processors import GIFTrainProcessor
from ullava_tpu.models import ullava_core
from ullava_tpu.registry import registry
from ullava_tpu.tasks import setup_task

from toy_tokenizer import ToyLlamaTokenizer


@pytest.fixture
def gif_root(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(4):
        frames = [rng.integers(0, 255, (32, 40, 3), np.uint8) for _ in range(6)]
        imageio.mimsave(tmp_path / f"clip{i}.gif", frames)
    anno = [
        {
            "gif": f"clip{i}.gif",
            "conversations": [
                {"from": "human", "value": "What happens ?"},
                {"from": "gpt", "value": f"Motion {i} ."},
            ],
        }
        for i in range(4)
    ]
    (tmp_path / "tgif.json").write_text(json.dumps(anno))
    return tmp_path


def test_gif_processor(gif_root):
    proc = GIFTrainProcessor(image_size=28, n_frm=4)
    out = proc(str(gif_root / "clip0.gif"))
    assert out.shape == (4, 28, 28, 3)
    assert out.dtype == np.float32


def test_tgif_dataset_and_video_model(gif_root):
    tok = ToyLlamaTokenizer()
    tok.add_tokens(MM_TOKENS)

    builder_cls = registry.get_builder_class("tgif")
    cfg = ConfigNode({
        "data_type": "gif",
        "image_token_len": 4,  # tiny CLIP has 4 patches
        "vis_processor": "gif_train",
        "build_info": {
            "anno_dir": str(gif_root / "tgif.json"),
            "image_dir": str(gif_root),
        },
    })
    builder = builder_cls(cfg, tok, "conv_simple")
    ds = builder.build(ConfigNode({"gif_train": {"image_size": 28, "n_frm": 4}}))
    sample = ds[0]
    assert sample["video"].shape == (4, 28, 28, 3)
    # n_frm + patch tokens were spliced into the text
    vid_patch = tok.convert_tokens_to_ids("<video_patch>")
    assert (np.asarray(sample["input_ids"]) == vid_patch).sum() == 4 + 4

    collator = VideoCollator(tok.pad_token_id, pad_multiple=8)
    loader = DataLoader(ds, batch_size=2, collate_fn=collator, num_workers=2)
    batch = next(iter(loader))
    assert batch["videos"].shape == (2, 4, 28, 28, 3)

    # Model: tiny core with matching vid marker ids; forward runs with
    # temporal+spatial pooled tokens.
    model_cfg = ullava_core.UllavaCoreConfig.tiny()
    import dataclasses

    model_cfg = dataclasses.replace(
        model_cfg,
        vid_start_id=int(tok.convert_tokens_to_ids("<vid_beg>")) % 150,
        vid_end_id=int(tok.convert_tokens_to_ids("</vid_end>")) % 150,
    )
    params = ullava_core.init_params(jax.random.PRNGKey(0), model_cfg)
    ids = np.asarray(batch["input_ids"]) % 150
    # re-mark the vid start token post-modulo
    orig = np.asarray(batch["input_ids"])
    ids[orig == tok.convert_tokens_to_ids("<vid_beg>")] = model_cfg.vid_start_id
    out = ullava_core.forward(
        params, model_cfg,
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(ids),
        videos=jnp.asarray(batch["videos"]),
        attn_lens=jnp.asarray(batch["attn_lens"]),
    )
    assert np.isfinite(float(out["loss"]))


def test_encode_video_pooling_shapes():
    cfg = ullava_core.UllavaCoreConfig.tiny()
    params = ullava_core.init_params(jax.random.PRNGKey(1), cfg)
    vids = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 28, 28, 3)),
                       jnp.float32)
    feats = ullava_core.encode_video(params, cfg, vids)
    # n_frm temporal tokens + num_patches spatial tokens
    assert feats.shape == (2, 3 + cfg.vision.num_patches, cfg.vision.hidden_size)


def test_loader_process_striping():
    class Toy:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"x": i}

    def collate(samples):
        return [s["x"] for s in samples]

    a = DataLoader(Toy(), 2, collate, shuffle=False, process_index=0,
                   process_count=2, num_workers=1)
    b = DataLoader(Toy(), 2, collate, shuffle=False, process_index=1,
                   process_count=2, num_workers=1)
    seen_a = [x for batch in a for x in batch]
    seen_b = [x for batch in b for x in batch]
    assert not set(seen_a) & set(seen_b)
    assert len(seen_a) == len(seen_b) == 6
