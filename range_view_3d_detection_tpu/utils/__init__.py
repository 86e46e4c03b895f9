"""Utilities: config composition, feather IO, logging."""
