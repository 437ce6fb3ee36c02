"""Test configuration: force an 8-device virtual CPU mesh.

The reference has no test suite at all (SURVEY.md §4); we build one. Tests
run on CPU with 8 virtual devices so multi-chip sharding logic is exercised
without TPU hardware (the fake-backend capability the reference lacks).
"""

import os

# must be set before jax is imported anywhere; force CPU even when the
# environment points at a TPU so tests are hermetic and deterministic
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms; override it back so tests stay on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
