"""TPU compute primitives: norms, rotary embeddings, attention kernels."""

from ullava_tpu.ops.norms import layer_norm, rms_norm  # noqa: F401
from ullava_tpu.ops.rope import apply_rotary, rope_cos_sin  # noqa: F401
from ullava_tpu.ops.attention import attention  # noqa: F401
