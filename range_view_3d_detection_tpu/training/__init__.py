"""Training layer: optimizer, jitted train step, loop, checkpoints."""
