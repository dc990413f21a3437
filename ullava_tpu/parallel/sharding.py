"""Parameter partition specs by tree-path rules.

One rule table maps parameter paths (joined with '/') to logical
(fsdp_dim, tp_dim) placements; everything else replicates. Optimizer
state reuses the same specs (sharded moments == the DeepSpeed-ZeRO
equivalent of the reference's `bf16_zero2.json`).

The specs assume stacked-layer leaves carry a leading scan axis (never
sharded). Divisibility is checked per leaf: a dim that does not divide by
its mesh axis size falls back to replication for that dim (so tiny test
configs shard what they can and replicate the rest).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-regex -> (fsdp axis position, tp axis position); None = replicated dim.
# Positions are negative (from the right) so stacked [L, ...] and single
# tensors share rules.
_RULES: Tuple[Tuple[str, Tuple[Optional[int], Optional[int]]], ...] = (
    # LLaMA decoder
    (r"llm/embed_tokens$", (-1, -2)),        # [V, D]: V on tp, D on fsdp
    (r"llm/layers/(q|k|v)_proj$", (-2, -1)),  # [L, D, H*hd]
    (r"llm/layers/o_proj$", (-1, -2)),        # [L, H*hd, D]
    (r"llm/layers/(gate|up)_proj$", (-2, -1)),
    (r"llm/layers/down_proj$", (-1, -2)),
    (r"llm/lm_head$", (-2, -1)),              # [D, V]
    # CLIP tower (frozen, fsdp-shard the big matrices)
    (r"vision/layers/(q|k|v)_proj$", (-2, -1)),
    (r"vision/layers/out_proj$", (-1, -2)),
    (r"vision/layers/fc1$", (-2, -1)),
    (r"vision/layers/fc2$", (-1, -2)),
    (r"vision/patch_proj$", (-2, None)),
    # mm projector
    (r"projector/fc\d+/w$", (-2, -1)),
    # SAM encoder (frozen; shard the stacked big weights over fsdp)
    (r"sam/image_encoder/(window|global)_blocks/qkv$", (-2, -1)),
    (r"sam/image_encoder/(window|global)_blocks/proj$", (-1, -2)),
    (r"sam/image_encoder/(window|global)_blocks/fc1$", (-2, -1)),
    (r"sam/image_encoder/(window|global)_blocks/fc2$", (-1, -2)),
    # seg/det heads
    (r"(seg|det)_projector/fc\d+/w$", (-2, -1)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path: str, ndim: int, shape, mesh_shape: Dict[str, int]) -> P:
    for pat, (fsdp_dim, tp_dim) in _RULES:
        if re.search(pat, path):
            axes: list = [None] * ndim
            if fsdp_dim is not None and mesh_shape.get("fsdp", 1) > 1:
                d = ndim + fsdp_dim
                if 0 <= d < ndim and shape[d] % mesh_shape["fsdp"] == 0:
                    axes[d] = "fsdp"
            if tp_dim is not None and mesh_shape.get("tp", 1) > 1:
                d = ndim + tp_dim
                if 0 <= d < ndim and axes[d] is None and shape[d] % mesh_shape["tp"] == 0:
                    axes[d] = "tp"
            return P(*axes)
    return P()  # replicate


def param_partition_specs(params: Any, mesh: Mesh) -> Any:
    """Pytree of PartitionSpec matching `params`."""
    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))

    def leaf_spec(path, leaf):
        return _spec_for(_path_str(path), leaf.ndim, leaf.shape, mesh_shape)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_partition_specs(params, mesh)
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a (host/replicated) param tree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard the leading axis over the combined data axes."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)
