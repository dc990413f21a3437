"""Training layer: optimizers, freeze policies, sharded train steps,
checkpointing, and the trainer loop."""
