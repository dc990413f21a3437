"""SAM (Segment Anything) in JAX: ViTDet image encoder, prompt encoder with
text-embedding prompts (the u-LLaVA [SEG] injection point), and the
two-way-transformer mask decoder."""

from ullava_tpu.models.sam.image_encoder import (  # noqa: F401
    SamVisionConfig,
    encode as encode_sam_image,
)
from ullava_tpu.models.sam.prompt_encoder import (  # noqa: F401
    SamPromptConfig,
    dense_positional_embedding,
    encode_prompts,
)
from ullava_tpu.models.sam.mask_decoder import (  # noqa: F401
    SamDecoderConfig,
    decode_masks,
)
from ullava_tpu.models.sam.build import (  # noqa: F401
    SamConfig,
    init_sam_params,
    sam_vit_b,
    sam_vit_h,
    sam_vit_l,
)
from ullava_tpu.models.sam.export import (  # noqa: F401
    export_sam_decoder,
    load_sam_decoder,
    make_decoder_fn,
)
