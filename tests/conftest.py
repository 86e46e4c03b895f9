"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes — conftest import runs first.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon TPU plugin overrides JAX_PLATFORMS; the legacy name still wins.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
