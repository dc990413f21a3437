from ullava_tpu.data.tools.mask_toolbox import DetToolBox, SegToolBox  # noqa: F401
from ullava_tpu.data.tools import rle  # noqa: F401
