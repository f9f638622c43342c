"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The dev container's sitecustomize registers a remote "axon" TPU backend
# and force-overrides jax_platforms at interpreter start; undo that here so
# tests run on the local 8-device virtual CPU mesh (fast, deterministic).
import jax

jax.config.update("jax_platforms", "cpu")
