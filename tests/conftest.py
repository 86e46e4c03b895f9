"""Test configuration: force an 8-device virtual CPU mesh.

Must set XLA flags before jax initializes — conftest import runs first.
"""

import os
import sys

# Force-override: the harness exports JAX_PLATFORMS=axon (the TPU tunnel),
# and the platform choice is latched before in-process env mutation takes
# effect — go through jax.config instead. Tests must run on the virtual CPU
# mesh for determinism vs the numpy oracles.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
