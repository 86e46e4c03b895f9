"""Host-side data layer (reference: ``src/torchbox3d/prototype/loader.py``)."""
