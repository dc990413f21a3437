"""Model layer: LLaMA decoder, CLIP ViT tower, projectors, SAM, and the
uLLaVA stage-1/stage-2 compositions."""
