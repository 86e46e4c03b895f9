"""Pure-JAX math/ops layer (reference: ``src/torchbox3d/math/``)."""
