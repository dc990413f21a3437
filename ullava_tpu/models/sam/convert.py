"""SAM checkpoint conversion -> this framework's pytree.

Accepts either the original Meta naming (`sam_vit_h_4b8939.pth`, what the
reference loads at `/root/reference/models/ullava.py:134-137`) or the HF
`SamModel` naming (used for tiny-model parity tests). HF keys are first
normalized to the original vocabulary, then converted once.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ullava_tpu.models.sam.build import SamConfig
from ullava_tpu.models.weights import _to_jnp

_HF_RULES = [
    (r"^vision_encoder\.", "image_encoder."),
    (r"^prompt_encoder\.shared_embedding\.positional_embedding$",
     "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    (r"^prompt_encoder\.point_embed\.(\d)\.", r"prompt_encoder.point_embeddings.\1."),
    (r"^prompt_encoder\.mask_embed\.conv1\.", "prompt_encoder.mask_downscaling.0."),
    (r"^prompt_encoder\.mask_embed\.layer_norm1\.", "prompt_encoder.mask_downscaling.1."),
    (r"^prompt_encoder\.mask_embed\.conv2\.", "prompt_encoder.mask_downscaling.3."),
    (r"^prompt_encoder\.mask_embed\.layer_norm2\.", "prompt_encoder.mask_downscaling.4."),
    (r"^prompt_encoder\.mask_embed\.conv3\.", "prompt_encoder.mask_downscaling.6."),
    (r"^mask_decoder\.upscale_conv1\.", "mask_decoder.output_upscaling.0."),
    (r"^mask_decoder\.upscale_layer_norm\.", "mask_decoder.output_upscaling.1."),
    (r"^mask_decoder\.upscale_conv2\.", "mask_decoder.output_upscaling.3."),
    (r"\.layer_norm_final_attn\.", ".norm_final_attn."),
    (r"\.layer_norm(\d)\.", r".norm\1."),
]
# Inside image_encoder (after vision_encoder rename): layers->blocks,
# projection->proj, neck names.
_ENC_RULES = [
    (r"^image_encoder\.layers\.", "image_encoder.blocks."),
    (r"^image_encoder\.patch_embed\.projection\.", "image_encoder.patch_embed.proj."),
    (r"^image_encoder\.neck\.conv1\.", "image_encoder.neck.0."),
    (r"^image_encoder\.neck\.norm1\.", "image_encoder.neck.1."),
    (r"^image_encoder\.neck\.conv2\.", "image_encoder.neck.2."),
    (r"^image_encoder\.neck\.norm2\.", "image_encoder.neck.3."),
]


def _hf_mlp_rename(key: str) -> str:
    """HF MLP (proj_in / layers.i / proj_out) -> original (layers.0..n)."""
    m = re.match(
        r"^(mask_decoder\.(?:output_hypernetworks_mlps\.\d+|iou_prediction_head))\.(.+)$",
        key,
    )
    if not m:
        return key
    base, rest = m.groups()
    if rest.startswith("proj_in."):
        return f"{base}.layers.0.{rest[len('proj_in.'):]}"
    mm = re.match(r"^layers\.(\d+)\.(.+)$", rest)
    if mm:
        return f"{base}.layers.{int(mm.group(1)) + 1}.{mm.group(2)}"
    if rest.startswith("proj_out."):
        # depth is only known per-MLP; resolved in normalize_sam_keys.
        return f"{base}.__proj_out__.{rest[len('proj_out.'):]}"
    return key


def normalize_sam_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF SamModel naming -> original Meta naming (no-op for original)."""
    if not any(k.startswith("vision_encoder.") for k in sd):
        return dict(sd)
    out: Dict[str, np.ndarray] = {}
    pending = {}
    for k, v in sd.items():
        if k.startswith("shared_image_embedding."):
            continue  # duplicate of prompt_encoder.shared_embedding
        for pat, rep in _HF_RULES:
            k = re.sub(pat, rep, k)
        for pat, rep in _ENC_RULES:
            k = re.sub(pat, rep, k)
        k = _hf_mlp_rename(k)
        if "__proj_out__" in k:
            pending[k] = np.asarray(v)
        else:
            out[k] = np.asarray(v)
    # proj_out index = max existing layer index + 1 per MLP; resolve depths
    # for all bases first so weight/bias land on the same layer index.
    depths: Dict[str, int] = {}
    for k in pending:
        base = k.split(".__proj_out__.")[0]
        if base not in depths:
            idxs = [
                int(re.match(rf"^{re.escape(base)}\.layers\.(\d+)\.", kk).group(1))
                for kk in out
                if kk.startswith(base + ".layers.")
            ]
            depths[base] = (max(idxs) + 1) if idxs else 0
    for k, v in pending.items():
        base = k.split(".__proj_out__.")[0]
        out[k.replace("__proj_out__", f"layers.{depths[base]}")] = v
    return out


def _lin(sd, name):
    return {"w": np.asarray(sd[name + ".weight"]).T, "b": np.asarray(sd[name + ".bias"])}


def _mlp(sd, base, n):
    return {f"fc{i}": _lin(sd, f"{base}.layers.{i}") for i in range(n)}


def _attn(sd, base):
    return {
        "q": _lin(sd, base + ".q_proj"),
        "k": _lin(sd, base + ".k_proj"),
        "v": _lin(sd, base + ".v_proj"),
        "out": _lin(sd, base + ".out_proj"),
    }


def _ln(sd, name):
    return {"scale": np.asarray(sd[name + ".weight"]), "bias": np.asarray(sd[name + ".bias"])}


def convert_sam(sd: Mapping[str, np.ndarray], cfg: SamConfig, dtype=None) -> Dict[str, Any]:
    sd = normalize_sam_keys(sd)
    v = cfg.vision
    dtype = dtype or v.dtype

    # ---- image encoder ----------------------------------------------------
    def block(i):
        b = f"image_encoder.blocks.{i}."
        return {
            "ln1_scale": np.asarray(sd[b + "norm1.weight"]),
            "ln1_bias": np.asarray(sd[b + "norm1.bias"]),
            "qkv": np.asarray(sd[b + "attn.qkv.weight"]).T,
            "qkv_bias": np.asarray(sd[b + "attn.qkv.bias"]),
            "proj": np.asarray(sd[b + "attn.proj.weight"]).T,
            "proj_bias": np.asarray(sd[b + "attn.proj.bias"]),
            "rel_pos_h": np.asarray(sd[b + "attn.rel_pos_h"]),
            "rel_pos_w": np.asarray(sd[b + "attn.rel_pos_w"]),
            "ln2_scale": np.asarray(sd[b + "norm2.weight"]),
            "ln2_bias": np.asarray(sd[b + "norm2.bias"]),
            "fc1": np.asarray(sd[b + "mlp.lin1.weight"]).T,
            "fc1_bias": np.asarray(sd[b + "mlp.lin1.bias"]),
            "fc2": np.asarray(sd[b + "mlp.lin2.weight"]).T,
            "fc2_bias": np.asarray(sd[b + "mlp.lin2.bias"]),
        }

    win_idx = [i for i in range(v.depth) if i not in v.global_attn_indexes]
    glob_idx = list(v.global_attn_indexes)
    stack = lambda blocks: {
        k: np.stack([blk[k] for blk in blocks]) for k in blocks[0]
    }
    patch_w = np.asarray(sd["image_encoder.patch_embed.proj.weight"])  # [C,3,p,p]
    neck0 = np.asarray(sd["image_encoder.neck.0.weight"])  # [O,C,1,1]
    neck2 = np.asarray(sd["image_encoder.neck.2.weight"])  # [O,O,3,3]
    img_params = {
        "patch_proj": patch_w.reshape(patch_w.shape[0], -1).T,
        "patch_bias": np.asarray(sd["image_encoder.patch_embed.proj.bias"]),
        "pos_embed": np.asarray(sd["image_encoder.pos_embed"])[0],
        "window_blocks": stack([block(i) for i in win_idx]),
        "global_blocks": stack([block(i) for i in glob_idx]),
        "neck_conv1": neck0[:, :, 0, 0].T,
        "neck_ln1_scale": np.asarray(sd["image_encoder.neck.1.weight"]),
        "neck_ln1_bias": np.asarray(sd["image_encoder.neck.1.bias"]),
        "neck_conv2": neck2.transpose(2, 3, 1, 0),  # HWIO
        "neck_ln2_scale": np.asarray(sd["image_encoder.neck.3.weight"]),
        "neck_ln2_bias": np.asarray(sd["image_encoder.neck.3.bias"]),
    }

    # ---- prompt encoder ---------------------------------------------------
    pe = "prompt_encoder."
    md = pe + "mask_downscaling."
    prompt_params = {
        "pe_gaussian": np.asarray(sd[pe + "pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": np.stack(
            [np.asarray(sd[pe + f"point_embeddings.{i}.weight"])[0] for i in range(4)]
        ),
        "not_a_point": np.asarray(sd[pe + "not_a_point_embed.weight"])[0],
        "no_mask": np.asarray(sd[pe + "no_mask_embed.weight"])[0],
        "mask_conv1": np.asarray(sd[md + "0.weight"]).transpose(2, 3, 1, 0),
        "mask_conv1_bias": np.asarray(sd[md + "0.bias"]),
        "mask_ln1_scale": np.asarray(sd[md + "1.weight"]),
        "mask_ln1_bias": np.asarray(sd[md + "1.bias"]),
        "mask_conv2": np.asarray(sd[md + "3.weight"]).transpose(2, 3, 1, 0),
        "mask_conv2_bias": np.asarray(sd[md + "3.bias"]),
        "mask_ln2_scale": np.asarray(sd[md + "4.weight"]),
        "mask_ln2_bias": np.asarray(sd[md + "4.bias"]),
        "mask_conv3": np.asarray(sd[md + "6.weight"]).transpose(2, 3, 1, 0),
        "mask_conv3_bias": np.asarray(sd[md + "6.bias"]),
    }

    # ---- mask decoder -----------------------------------------------------
    dd = "mask_decoder."
    tr = dd + "transformer."
    layers = []
    for i in range(cfg.decoder.depth):
        b = f"{tr}layers.{i}."
        layers.append({
            "self_attn": _attn(sd, b + "self_attn"),
            "ln1": _ln(sd, b + "norm1"),
            "cross_t2i": _attn(sd, b + "cross_attn_token_to_image"),
            "ln2": _ln(sd, b + "norm2"),
            "mlp": {"fc0": _lin(sd, b + "mlp.lin1"), "fc1": _lin(sd, b + "mlp.lin2")},
            "ln3": _ln(sd, b + "norm3"),
            "cross_i2t": _attn(sd, b + "cross_attn_image_to_token"),
            "ln4": _ln(sd, b + "norm4"),
        })
    n_hyper_layers = 3
    dec_params = {
        "iou_token": np.asarray(sd[dd + "iou_token.weight"]),
        "mask_tokens": np.asarray(sd[dd + "mask_tokens.weight"]),
        "layers": layers,
        "final_attn": _attn(sd, tr + "final_attn_token_to_image"),
        "final_ln": _ln(sd, tr + "norm_final_attn"),
        # ConvTranspose2d weight [in, out, kh, kw] -> [kh, kw, in, out]
        "upscale_conv1": np.asarray(sd[dd + "output_upscaling.0.weight"]).transpose(2, 3, 0, 1),
        "upscale_conv1_bias": np.asarray(sd[dd + "output_upscaling.0.bias"]),
        "upscale_ln": _ln(sd, dd + "output_upscaling.1"),
        "upscale_conv2": np.asarray(sd[dd + "output_upscaling.3.weight"]).transpose(2, 3, 0, 1),
        "upscale_conv2_bias": np.asarray(sd[dd + "output_upscaling.3.bias"]),
        "hyper_mlps": [
            _mlp(sd, dd + f"output_hypernetworks_mlps.{i}", n_hyper_layers)
            for i in range(cfg.decoder.num_mask_tokens)
        ],
        "iou_head": _mlp(sd, dd + "iou_prediction_head", cfg.decoder.iou_head_depth),
    }

    return {
        "image_encoder": _to_jnp(img_params, dtype),
        "prompt_encoder": _to_jnp(prompt_params, jnp.float32),
        "mask_decoder": _to_jnp(dec_params, jnp.float32),
    }
