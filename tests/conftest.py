"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-world substitute for a fake/distributed test backend (SURVEY.md
section 4): all unit + multi-chip sharding tests execute on CPU with
``xla_force_host_platform_device_count=8`` so the full pjit/shard_map
path is exercised without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.  Forced (not setdefault):
# the environment may point JAX at a remote TPU; unit tests stay on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote-TPU PJRT
# plugin and pins jax_platforms to it; the config update (not just the
# env var) is what actually wins after that registration.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
