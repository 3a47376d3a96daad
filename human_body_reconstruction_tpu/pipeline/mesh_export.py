"""Mesh export: chunked TPU density sweep -> marching cubes -> PLY/OBJ.

Capability parity with reference ``nerf2mesh.py``:
  * rebuild encoder+MLP from a checkpoint and saved bounds
    (nerf2mesh.py:28-64),
  * sweep a resolution^3 grid over the bounds through the field in
    fixed-size chunks with view dir (0, 0, 1) (nerf2mesh.py:69-87),
  * cache the (R, R, R, 4) rgb+sigma grid to ``density_grid_w_rgb.npy``
    (nerf2mesh.py:72, 87-88),
  * extract the iso-surface at the requested level (default 30.0,
    nerf2mesh.py:98) and colour vertices — by the field's own rgb
    (improvement) or by normalised XYZ (exact reference behaviour,
    nerf2mesh.py:92-94),
  * write the mesh to disk (the reference only opens a viewer window).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.models import nerf
from human_body_reconstruction_tpu.ops import marching_cubes as mc
from human_body_reconstruction_tpu.ops import positional
from human_body_reconstruction_tpu.utils.config import PipelineConfig


@functools.partial(jax.jit, static_argnames=("cfg", "R", "chunk"))
def _sweep_chunk(params, lo, span, dirs_enc, scene, start, cfg, R, chunk):
    """One density-sweep chunk.  params/bounds are ARGUMENTS (not
    closure constants) so the lowered HLO is checkpoint-independent —
    a prerequisite for the AOT executable cache."""
    flat = start + jnp.arange(chunk, dtype=jnp.int32)
    k = flat % R
    j = (flat // R) % R
    i = flat // (R * R)
    ijk = jnp.stack([i, j, k], axis=-1).astype(jnp.float32)
    p = lo + ijk / (R - 1) * span
    d = jnp.broadcast_to(dirs_enc, (p.shape[0], dirs_enc.shape[-1]))
    rgb, sigma = nerf.field_forward(params, scene, p, d, cfg,
                                    compute_dtype=jnp.bfloat16)
    rgb8 = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
    # fp16 range clip: trained densities can exceed 65504 and the
    # iso threshold (~30) only needs ~1e-3 relative precision
    sig16 = jnp.clip(sigma, -6.0e4, 6.0e4).astype(jnp.float16)
    return rgb8, sig16


def density_rgb_grid(params, scene, cfg: PipelineConfig, *,
                     resolution: int = 256, chunk: int = 262144,
                     cache_path: Optional[str] = None,
                     aot_cache: Optional[str] = None) -> np.ndarray:
    """(R, R, R, 4) float32 grid of (r, g, b, sigma) over the scene bounds.

    grid[i, j, k] is the field at (x_i, y_j, z_k) ('ij' indexing — unlike
    the reference's tangled default-'xy' meshgrid, nerf2mesh.py:37).

    Device->host precision: rgb is transported as uint8 (1/255
    quantisation, invisible in vertex colours) and sigma as fp16
    (clipped to +-6e4; iso thresholding needs ~1e-3 relative) — the
    remote-tunnel transfer is the sweep bottleneck, not compute.
    """
    if cache_path and os.path.exists(cache_path):
        arr = np.load(cache_path)
        if arr.shape == (resolution,) * 3 + (4,):
            return arr

    lo = np.asarray(scene["min_bound"], np.float32)
    hi = np.asarray(scene["max_bound"], np.float32)

    view = jnp.asarray([[0.0, 0.0, 1.0]])
    dirs_enc = positional.positional_encode(view, cfg.dir_enc.num_freq,
                                            cfg.dir_enc.mode)

    # Everything device-side takes and returns the MINIMUM bytes: the
    # chunk is addressed by its flat start index (grid coordinates are
    # recomputed on device — no (chunk, 3) float uplink per call), rgb
    # comes back as uint8 and sigma as fp16 (5 B/point instead of 16).
    # Through the remote-TPU tunnel the sweep is transfer-bound, so
    # this is a ~4x on the non-compile sweep time (docs/PERF_NOTES.md).
    R = resolution
    lo_j = jnp.asarray(lo)
    span = jnp.asarray(hi - lo)

    fwd = _sweep_chunk
    if aot_cache:
        from human_body_reconstruction_tpu.utils import aot

        fwd = aot.CachedJit(_sweep_chunk, aot.AOTCache(aot_cache),
                            static_argnames=("cfg", "R", "chunk"))

    total = R * R * R
    pad = (-total) % chunk
    # dispatch EVERY chunk before collecting any: jit dispatch is async,
    # so device compute for chunk i+1.. overlaps the (tunnel-bound)
    # device->host transfer of chunk i instead of serialising sync ->
    # dispatch -> sync per chunk
    pending = [fwd(params, lo_j, span, dirs_enc, scene,
                   jnp.asarray(s, jnp.int32), cfg=cfg, R=R, chunk=chunk)
               for s in range(0, total + pad, chunk)]
    rgb_parts, sig_parts = [], []
    for rgb8, sig in pending:
        rgb_parts.append(np.asarray(rgb8))
        sig_parts.append(np.asarray(sig))
    rgb = np.concatenate(rgb_parts)[:total].astype(np.float32) / 255.0
    sigma = np.concatenate(sig_parts)[:total].astype(np.float32)
    if aot_cache:
        print(f"aot cache: {fwd.cache.stats()}")
    grid = np.concatenate([rgb, sigma[:, None]], axis=-1).reshape(
        resolution, resolution, resolution, 4)
    if cache_path:
        np.save(cache_path, grid)
    return grid


def resolve_iso(field: "np.ndarray", iso) -> float:
    """Resolve an iso level; ``iso="auto"`` picks a level set between
    the field's bulk (empty space — the median, since the subject
    occupies a small fraction of the bounds box) and its far tail (the
    subject interior — the 0.1th percentile).

    Why it exists: the 2*sigmoid-1 pseudo-SDF head trains through the
    phi-RATIO compositor (reference helper.py:80-85), which only needs
    phi to DROP at the surface — nothing anchors the zero level, and a
    measured chip-trained field sat entirely in [-0.93, -0.55] (inside
    more negative), so the reference's fixed iso=0 (test_hash.py:60)
    extracts an empty mesh.  The midpoint of bulk and interior tail
    brackets the surface transition for any constant offset.  A numeric
    iso passes through unchanged (density exports keep 30.0).
    """
    if not isinstance(iso, str):
        return float(iso)
    if iso != "auto":
        raise ValueError(f"iso must be a number or 'auto', got {iso!r}")
    bulk = float(np.median(field))
    tail = float(np.percentile(field, 0.1))
    if tail == bulk:            # degenerate/untrained field
        return bulk
    level = 0.5 * (bulk + tail)
    print(f"auto iso: bulk {bulk:.4f}, interior tail {tail:.4f} "
          f"-> level {level:.4f}")
    return level


def export_mesh(params, scene, cfg: PipelineConfig, *,
                resolution: int = 256, iso: float = 30.0,
                chunk: int = 262144, cache_path: Optional[str] = None,
                out_path: str = "mesh.ply", color_mode: str = "rgb",
                weld: bool = True, verbose: bool = True,
                aot_cache: Optional[str] = None) -> dict:
    """Full export. Returns stats dict (counts + stage timings)."""
    t0 = time.perf_counter()
    grid = density_rgb_grid(params, scene, cfg, resolution=resolution,
                            chunk=chunk, cache_path=cache_path,
                            aot_cache=aot_cache)
    t_sweep = time.perf_counter() - t0

    t0 = time.perf_counter()
    field = np.ascontiguousarray(grid[..., 3])
    iso = resolve_iso(field, iso)
    verts, faces, keys = mc.marching_cubes(field, iso, return_keys=True)
    if weld:
        verts, faces = mc.weld_vertices(verts, faces, keys=keys)
    t_mc = time.perf_counter() - t0

    if len(verts):
        if color_mode == "xyz":
            # reference behaviour: colour = normalised grid coordinate
            # (nerf2mesh.py:92-94)
            colors = verts / (resolution - 1)
        else:
            colors = np.clip(mc.grid_interp(grid[..., :3], verts), 0.0, 1.0)
    else:
        colors = np.zeros((0, 3), np.float32)

    world_verts = mc.verts_to_world(verts, scene["min_bound"],
                                    scene["max_bound"], resolution)
    if out_path.endswith(".obj"):
        mc.write_obj(out_path, world_verts, faces)
    else:
        mc.write_ply(out_path, world_verts, faces, colors)

    stats = {"num_verts": int(len(verts)), "num_faces": int(len(faces)),
             "sweep_seconds": t_sweep, "marching_seconds": t_mc,
             "out_path": out_path, "verts": world_verts, "faces": faces,
             "colors": colors}
    if verbose:
        print(f"density sweep {resolution}^3: {t_sweep:.2f}s; "
              f"marching tets: {t_mc:.2f}s; "
              f"{stats['num_verts']} verts / {stats['num_faces']} faces "
              f"-> {out_path}")
    return stats


def view_mesh(verts, faces, colors=None):
    """Open an interactive open3d window with the mesh and its wireframe
    (reference nerf2mesh.py:102-107). Gated on open3d being importable
    and a display being available; raises ImportError otherwise."""
    import open3d as o3d  # optional dependency

    mesh = o3d.geometry.TriangleMesh(
        o3d.utility.Vector3dVector(np.asarray(verts, np.float64)),
        o3d.utility.Vector3iVector(np.asarray(faces, np.int32)))
    if colors is not None and len(colors) == len(verts):
        mesh.vertex_colors = o3d.utility.Vector3dVector(
            np.asarray(colors, np.float64))
    mesh.compute_vertex_normals()
    wire = o3d.geometry.LineSet.create_from_triangle_mesh(mesh)
    o3d.visualization.draw_geometries([mesh, wire])
