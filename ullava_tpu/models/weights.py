"""Checkpoint conversion: HF torch state dicts -> stacked JAX pytrees.

Converts released checkpoints (Vicuna-7B LLaMA, CLIP ViT-L/14,
SAM ViT-H `sam_vit_h_4b8939.pth`) into this framework's parameter layout:
torch `Linear` stores [out, in]; we store [in, out] so `x @ w` hits the
MXU without transposes, and per-layer tensors are stacked on a leading
layer axis for `lax.scan`.

Loading is torch-free when possible: `.safetensors` via numpy; `.bin`/
`.pth` fall back to `torch.load` on CPU.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load one or many checkpoint shards into a numpy state dict."""
    if os.path.isdir(path):
        out: Dict[str, np.ndarray] = {}
        index = os.path.join(path, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            files = [os.path.join(path, s) for s in shards]
        else:
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith((".safetensors", ".bin", ".pth"))
            )
        for f in files:
            out.update(load_state_dict(f))
        return out
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}


def _stack(sd: Mapping[str, np.ndarray], fmt: str, n: int, transpose=False):
    mats = [np.asarray(sd[fmt.format(i)]) for i in range(n)]
    stacked = np.stack(mats)
    if transpose:
        stacked = stacked.transpose(0, 2, 1)
    return stacked


def convert_llama(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    dtype=jnp.bfloat16,
    prefix: str = "",
) -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict -> `models.llama` param pytree."""
    p = prefix

    def t(name):  # single [out,in] -> [in,out]
        return np.asarray(sd[p + name]).T

    params = {
        "embed_tokens": np.asarray(sd[p + "model.embed_tokens.weight"]),
        "layers": {
            "input_norm": _stack(sd, p + "model.layers.{}.input_layernorm.weight", num_layers),
            "q_proj": _stack(sd, p + "model.layers.{}.self_attn.q_proj.weight", num_layers, transpose=True),
            "k_proj": _stack(sd, p + "model.layers.{}.self_attn.k_proj.weight", num_layers, transpose=True),
            "v_proj": _stack(sd, p + "model.layers.{}.self_attn.v_proj.weight", num_layers, transpose=True),
            "o_proj": _stack(sd, p + "model.layers.{}.self_attn.o_proj.weight", num_layers, transpose=True),
            "post_norm": _stack(sd, p + "model.layers.{}.post_attention_layernorm.weight", num_layers),
            "gate_proj": _stack(sd, p + "model.layers.{}.mlp.gate_proj.weight", num_layers, transpose=True),
            "up_proj": _stack(sd, p + "model.layers.{}.mlp.up_proj.weight", num_layers, transpose=True),
            "down_proj": _stack(sd, p + "model.layers.{}.mlp.down_proj.weight", num_layers, transpose=True),
        },
        "norm": np.asarray(sd[p + "model.norm.weight"]),
        "lm_head": t("lm_head.weight"),
    }
    return _to_jnp(params, dtype)


def convert_clip_vision(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    dtype=jnp.bfloat16,
    prefix: str = "vision_model.",
) -> Dict[str, Any]:
    """HF CLIPVisionModel state dict -> `models.clip_vit` param pytree."""
    p = prefix
    conv_w = np.asarray(sd[p + "embeddings.patch_embedding.weight"])  # [D,3,ph,pw]
    D = conv_w.shape[0]
    lyr = p + "encoder.layers.{}."

    def ws(name, transpose=False):
        return _stack(sd, lyr + name, num_layers, transpose=transpose)

    params = {
        "class_embedding": np.asarray(sd[p + "embeddings.class_embedding"]),
        "patch_proj": conv_w.reshape(D, -1).T,  # (C, ph, pw) flatten order
        "position_embedding": np.asarray(sd[p + "embeddings.position_embedding.weight"]),
        "pre_ln": {
            "scale": np.asarray(sd[p + "pre_layrnorm.weight"]),
            "bias": np.asarray(sd[p + "pre_layrnorm.bias"]),
        },
        "layers": {
            "ln1_scale": ws("layer_norm1.weight"),
            "ln1_bias": ws("layer_norm1.bias"),
            "q_proj": ws("self_attn.q_proj.weight", transpose=True),
            "q_bias": ws("self_attn.q_proj.bias"),
            "k_proj": ws("self_attn.k_proj.weight", transpose=True),
            "k_bias": ws("self_attn.k_proj.bias"),
            "v_proj": ws("self_attn.v_proj.weight", transpose=True),
            "v_bias": ws("self_attn.v_proj.bias"),
            "out_proj": ws("self_attn.out_proj.weight", transpose=True),
            "out_bias": ws("self_attn.out_proj.bias"),
            "ln2_scale": ws("layer_norm2.weight"),
            "ln2_bias": ws("layer_norm2.bias"),
            "fc1": ws("mlp.fc1.weight", transpose=True),
            "fc1_bias": ws("mlp.fc1.bias"),
            "fc2": ws("mlp.fc2.weight", transpose=True),
            "fc2_bias": ws("mlp.fc2.bias"),
        },
        "post_ln": {
            "scale": np.asarray(sd[p + "post_layernorm.weight"]),
            "bias": np.asarray(sd[p + "post_layernorm.bias"]),
        },
    }
    return _to_jnp(params, dtype)


def _to_jnp(tree, dtype):
    import jax

    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)


def torch_module_state_dict(module) -> Dict[str, np.ndarray]:
    """Torch nn.Module -> numpy state dict (for parity tests)."""
    return {
        k: v.detach().float().cpu().numpy() for k, v in module.state_dict().items()
    }
