"""Checkpoint / resume and the three-artifact contract.

The reference persists (SURVEY.md section 5):
  1. model checkpoints: ``{name}_Nerf_hash.pth`` + ``{name}_encoder_hash.pth``
     state-dicts overwritten in place (train_hash2.py:299-300),
  2. scene bounds: ``bounds_model.npy`` = stack([min, max])
     (train_hash2.py:114-115) — consumed by mesh export (nerf2mesh.py:28),
  3. density-grid cache: ``density_grid_w_rgb.npy`` (nerf2mesh.py:87-88).

Here a single ``.npz`` carries params + optimizer state + step so resume
is exact (the reference loses optimizer state on --load).  The bounds
artifact keeps the reference's stacked-[min, max] .npy layout for
interop, and the loader accepts either the trainer's name
(``bounds_model.npy``) or the mesh exporter's (``bounds.npy``) — the
reference's two scripts disagree (train_hash2.py:115 vs nerf2mesh.py:21).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree: Any, extra: Optional[dict] = None):
    """Save an arbitrary pytree of arrays to one .npz."""
    leaves, _ = _flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_pytree(path: str, template: Any, extra_keys=()) -> Tuple[Any, dict]:
    """Load leaves saved by :func:`save_pytree` into ``template``'s
    structure (shapes/dtypes validated against the template)."""
    leaves, treedef = _flatten(template)
    with np.load(path) as data:
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            want = np.shape(leaf)
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != model {want}")
            new_leaves.append(arr)
        extra = {k: data[f"extra_{k}"] for k in extra_keys
                 if f"extra_{k}" in data}
    return jax.tree_util.tree_unflatten(treedef, new_leaves), extra


def save_train_state(path: str, state):
    """Persist step + params + optimizer state (+ occupancy if present)."""
    extra = {"step": int(state.step)}
    if state.occ is not None:
        extra["occ_density"] = state.occ.density
        extra["occ_mask"] = state.occ.mask
        extra["occ_threshold"] = state.occ.threshold
    save_pytree(path, (state.params, state.opt_state), extra=extra)


def load_train_state(path: str, state, allow_occ: bool = True):
    """``allow_occ`` gates restoring a saved occupancy grid into an
    occ-less template: True for the warmup-resume case (the grid must
    come back even though warmup held it out of the template), False
    when the caller's config has occupancy DISABLED — attaching the
    saved grid there would silently cull through a frozen stale mask
    that nothing ever updates."""
    (params, opt_state), extra = load_pytree(
        path, (state.params, state.opt_state),
        extra_keys=("step", "occ_density", "occ_mask", "occ_threshold"))
    import jax.numpy as jnp

    occ = state.occ
    if "occ_density" in extra and (allow_occ or occ is not None):
        from human_body_reconstruction_tpu.ops.occupancy import OccupancyGrid

        occ = OccupancyGrid(density=jnp.asarray(extra["occ_density"]),
                            mask=jnp.asarray(extra["occ_mask"]),
                            threshold=jnp.asarray(extra["occ_threshold"]))
    return state._replace(
        params=jax.tree.map(jnp.asarray, params),
        opt_state=jax.tree.map(jnp.asarray, opt_state),
        step=jnp.asarray(int(extra.get("step", 0)), jnp.int32),
        occ=occ)


def save_bounds(path: str, min_bound, max_bound):
    """Reference-layout bounds artifact: np.save(stack([min, max]))."""
    np.save(path, np.stack([np.asarray(min_bound), np.asarray(max_bound)]))


def load_bounds(path: str):
    """Accept either bounds filename spelling (fixes the reference's
    bounds_model.npy vs bounds.npy mismatch)."""
    candidates = [path]
    d, b = os.path.dirname(path) or ".", os.path.basename(path)
    alt = {"bounds.npy": "bounds_model.npy",
           "bounds_model.npy": "bounds.npy"}.get(b)
    if alt:
        candidates.append(os.path.join(d, alt))
    for p in candidates:
        if os.path.exists(p):
            arr = np.load(p)
            return arr[0].astype(np.float32), arr[1].astype(np.float32)
    raise FileNotFoundError(f"no bounds file at any of {candidates}")
