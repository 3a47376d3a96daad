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

import re  # noqa: E402

import pytest  # noqa: E402

# ---------------------------------------------------------------- markers
#
# The full suite takes >30 min on a 1-core VM; these markers carve out a
# <5-min fast lane (``pytest -m "not slow"``) and named subsets:
#   slow      — trainer runs, convergence checks, compile-heavy e2e
#   parallel  — multi-device mesh tests (shard_map/pjit on the virtual
#               8-device CPU mesh)
#   mesh      — marching-cubes / native-extension tests
# Marking is centralised here (file + name patterns) so new tests get
# classified without per-file boilerplate.

_PARALLEL_FILES = {
    "test_parallel.py", "test_level_parallel.py", "test_sample_parallel.py",
    "test_multi_scene.py", "test_graft_entry.py",
}
_MESH_FILES = {"test_mesh.py"}
_SLOW_FILES = {
    # dominated by trainer loops / full-step compiles / interpret-mode
    # pallas sweeps (measured: docs/STATUS.md round-3 fast-lane timing)
    "test_train_e2e.py", "test_aot.py", "test_quality_matrix_modes.py",
    "test_graft_entry.py", "test_serve.py", "test_render_cli.py",
    "test_reconstruct.py", "test_multi_scene.py", "test_sample_parallel.py",
    "test_parallel.py", "test_level_parallel.py", "test_mesh.py",
    "test_cp_pallas.py",
}
_SLOW_NAME_RE = re.compile(
    r"converge|trains|_e2e|resume|trainer|speedrun|flagship")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        if fname in _PARALLEL_FILES:
            item.add_marker(pytest.mark.parallel)
        if fname in _MESH_FILES:
            item.add_marker(pytest.mark.mesh)
        if fname in _SLOW_FILES or _SLOW_NAME_RE.search(item.name):
            item.add_marker(pytest.mark.slow)
