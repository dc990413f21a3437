"""Device-mesh parallelism: mesh construction, parameter partitioning,
and sharded train-step builders.

Replaces the reference's torchrun DDP + DeepSpeed ZeRO-2 stack
(SURVEY.md §2.10): data parallelism is a mesh axis, ZeRO-style
optimizer/param sharding is the `fsdp` axis, and tensor parallelism for
7B serving is the `tp` axis — all realized by `jax.sharding` +
jit-partitioned collectives over ICI, not explicit NCCL calls.
"""

from ullava_tpu.parallel.mesh import MeshConfig, make_mesh  # noqa: F401
from ullava_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_specs,
    shard_params,
)
