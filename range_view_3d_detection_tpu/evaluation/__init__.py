"""Evaluation layer (reference: ``src/torchbox3d/evaluation/`` + the
``av2`` package's detection eval invoked at ``nn/arch/detector.py:472``)."""
