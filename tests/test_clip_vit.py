"""CLIP vision tower: parity vs HF CLIPVisionModel hidden states."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ullava_tpu.models import clip_vit
from ullava_tpu.models.weights import convert_clip_vision, torch_module_state_dict


@pytest.fixture(scope="module")
def tiny_pair():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel

    hf_cfg = HFConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = CLIPVisionModel(hf_cfg).eval()
    sd = torch_module_state_dict(hf_model)

    cfg = clip_vit.CLIPVisionConfig.tiny()
    params = convert_clip_vision(sd, cfg.num_layers, dtype=jnp.float32)
    return hf_model, cfg, params


@pytest.mark.parametrize("hidden_layer", [-1, -2])
def test_hidden_states_match_hf(tiny_pair, hidden_layer):
    torch = pytest.importorskip("torch")
    hf_model, cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    # NCHW for torch, NHWC for us.
    img = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.tensor(img), output_hidden_states=True)
    ref_h = ref.hidden_states[hidden_layer].numpy()

    out = clip_vit.forward(
        params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), hidden_layer=hidden_layer
    )
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"]), ref_h, atol=2e-4, rtol=2e-4
    )
    # patch_features drops CLS (reference encode_image drops index 0).
    np.testing.assert_allclose(
        np.asarray(out["patch_features"]), ref_h[:, 1:], atol=2e-4, rtol=2e-4
    )


def test_patchify_order_matches_conv(tiny_pair):
    torch = pytest.importorskip("torch")
    hf_model, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model.vision_model.embeddings.patch_embedding(
            torch.tensor(img)
        ).flatten(2).transpose(1, 2).numpy()  # [B, P, D]

    patches = clip_vit.patchify(jnp.asarray(img.transpose(0, 2, 3, 1)), cfg.patch_size)
    got = np.asarray(patches @ params["patch_proj"])
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_hidden_layer_bounds(tiny_pair):
    _, cfg, params = tiny_pair
    img = jnp.zeros((1, 28, 28, 3))
    with pytest.raises(ValueError):
        clip_vit.forward(params, cfg, img, hidden_layer=-10)
