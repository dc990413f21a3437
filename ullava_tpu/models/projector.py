"""Projector heads: vision->LLM projector, seg/det projectors, box decoder.

Mirrors the reference head shapes:
- vision projector 'mlp' (Linear 1024->4096) / 'mlp2x' (Linear-GELU-Linear),
  `/root/reference/models/ullava_core.py:117-129`;
- seg/det projector Linear(4096,4096)-ReLU-Linear(4096,256)-Dropout(0.0),
  `/root/reference/models/ullava.py:83-132`;
- det box decoder Linear(256,256)-ReLU-Linear(256,128)-ReLU-Linear(128,4),
  `/root/reference/models/ullava.py:96-107`.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _linear_init(key, in_dim, out_dim, dtype):
    # Kaiming-uniform fan_in (torch nn.Linear default) keeps converted and
    # scratch-initialized checkpoints statistically comparable.
    bound = (1.0 / in_dim) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound).astype(dtype),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound).astype(dtype),
    }


def init_mlp(key, dims: Sequence[int], dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {f"fc{i}": _linear_init(k, dims[i], dims[i + 1], dtype)
            for i, k in enumerate(keys)}


def apply_mlp(params: Params, x: jax.Array, activation=jax.nn.relu) -> jax.Array:
    n = len(params)
    for i in range(n):
        p = params[f"fc{i}"]
        x = x @ p["w"] + p["b"]
        if i < n - 1:
            x = activation(x)
    return x


# -- vision projector --------------------------------------------------------


def init_vision_projector(
    key, in_dim: int, out_dim: int, projector_type: str = "mlp", dtype=jnp.float32
) -> Params:
    if projector_type == "mlp":
        return init_mlp(key, [in_dim, out_dim], dtype)
    if projector_type == "mlp2x":
        return init_mlp(key, [in_dim, out_dim, out_dim], dtype)
    raise NotImplementedError(f"projector type {projector_type}")


def apply_vision_projector(params: Params, feats: jax.Array) -> jax.Array:
    # 'mlp' is a single linear; 'mlp2x' interleaves GELU (inferred from the
    # parameter structure, so checkpoints stay self-describing).
    return apply_mlp(params, feats, activation=jax.nn.gelu)


# -- seg/det projection heads ------------------------------------------------


def init_text_head(key, in_dim: int = 4096, out_dim: int = 256, dtype=jnp.float32):
    """[SEG]/[LOC] hidden-state projector (dropout p=0.0 in the reference
    => omitted)."""
    return init_mlp(key, [in_dim, in_dim, out_dim], dtype)


def apply_text_head(params: Params, x: jax.Array) -> jax.Array:
    return apply_mlp(params, x, activation=jax.nn.relu)


def init_box_decoder(key, in_dim: int = 256, dtype=jnp.float32):
    return init_mlp(key, [in_dim, 256, 128, 4], dtype)


def apply_box_decoder(params: Params, x: jax.Array) -> jax.Array:
    return apply_mlp(params, x, activation=jax.nn.relu)
