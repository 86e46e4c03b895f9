"""Flax model layer (reference: ``src/torchbox3d/nn/``)."""
