from ullava_tpu.data.collators.collators import (  # noqa: F401
    BaseCollator,
    GroundingCollator,
    ImageCollator,
    ImageVideoCollator,
    SegmentationCollator,
    VideoCollator,
)
