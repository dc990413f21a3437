"""Checkpoint pre-conversion CLI.

Converts released torch checkpoints (HF Vicuna/LLaMA dir, HF CLIP dir,
Meta `sam_vit_h_4b8939.pth`) into this framework's orbax layout once, so
training/serving startup skips the torch->numpy->jax conversion each run.

Usage:
  python tools/convert_checkpoint.py llama  <hf_dir>  <out_dir> [--dtype bf16]
  python tools/convert_checkpoint.py clip   <hf_dir>  <out_dir>
  python tools/convert_checkpoint.py sam    <ckpt.pth> <out_dir> [--variant vit_h]

The output directory is a plain orbax checkpoint restorable with
`ullava_tpu.training.checkpoint.restore_checkpoint` (or pointable from
`model.pretrained_*` config keys after assembling the composite tree).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["llama", "clip", "sam"])
    parser.add_argument("src")
    parser.add_argument("out")
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--variant", default="vit_h", choices=["vit_h", "vit_l", "vit_b"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ullava_tpu.models.weights import load_state_dict

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    sd = load_state_dict(args.src)

    if args.kind == "llama":
        import json

        from ullava_tpu.models.weights import convert_llama

        with open(os.path.join(args.src, "config.json")) as f:
            n_layers = json.load(f)["num_hidden_layers"]
        tree = convert_llama(sd, n_layers, dtype)
    elif args.kind == "clip":
        import json

        from ullava_tpu.models.weights import convert_clip_vision

        with open(os.path.join(args.src, "config.json")) as f:
            hf = json.load(f)
        hf = hf.get("vision_config", hf)
        tree = convert_clip_vision(sd, hf["num_hidden_layers"], dtype)
    else:
        from ullava_tpu.models.sam import build as sam_build
        from ullava_tpu.models.sam.convert import convert_sam

        cfg = getattr(sam_build, f"sam_{args.variant}")(dtype=dtype)
        tree = convert_sam(sd, cfg, dtype)

    out = os.path.abspath(args.out)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(out, jax.device_get(tree))
    print(f"converted {args.kind} checkpoint -> {out}")


if __name__ == "__main__":
    main()
