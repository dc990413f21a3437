"""Mesh construction over TPU slices.

Axes:
- ``dp``   data parallel (pure replication of params; gradients all-reduce)
- ``fsdp`` fully-sharded data parallel (params + optimizer state sharded;
           the ZeRO-2/3 equivalent of the reference's DeepSpeed configs)
- ``tp``   tensor parallel (attention heads / MLP columns, for serving)

Batches shard over (dp, fsdp); weights over (fsdp, tp). On a single host
the mesh covers the local devices; under `jax.distributed` it spans the
slice with ICI-contiguous axis order (tp innermost).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: Optional[int] = None  # None -> inferred from device count
    fsdp: int = 1
    tp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        if self.dp is not None:
            return self
        denom = self.fsdp * self.tp
        if n_devices % denom:
            raise ValueError(f"{n_devices} devices not divisible by fsdp*tp={denom}")
        return dataclasses.replace(self, dp=n_devices // denom)


AXIS_NAMES = ("dp", "fsdp", "tp")


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = cfg.resolve(len(devices))
    if cfg.dp * cfg.fsdp * cfg.tp != len(devices):
        raise ValueError(
            f"mesh {cfg.dp}x{cfg.fsdp}x{cfg.tp} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(cfg.dp, cfg.fsdp, cfg.tp)
    return Mesh(arr, AXIS_NAMES)
