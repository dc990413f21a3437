"""Host-side data layer: processors, datasets, builders, collators, tools.

Everything here is fixed-shape by construction: collators emit dense
padded numpy tensors with validity masks (no ragged lists), so batches
feed jit-compiled train/eval steps directly.

Importing this package registers all processors, builders, and collators
with the global registry (the YAML names are the public config surface).
"""

from ullava_tpu.data import builders, collators, processors  # noqa: F401
from ullava_tpu.data.loader import DataLoader  # noqa: F401
