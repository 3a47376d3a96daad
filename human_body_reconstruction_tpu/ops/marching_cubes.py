"""Iso-surface extraction: ctypes bridge to the native C++ extension,
trilinear grid colour sampling, and mesh file writers.

Replaces the reference's torchmcubes CUDA dependency
(nerf2mesh.py:13, 98-99: ``marching_cubes(density, iso)`` +
``grid_interp(color_grid, verts)``) with:
  * a host-side C++ marching-tetrahedra extension (threads over slabs),
  * ``grid_interp`` as plain jnp trilinear interpolation,
  * PLY/OBJ writers (the reference only opens an open3d viewer and never
    writes the mesh to disk, nerf2mesh.py:102-107).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "marching.cpp")

_lib = None


def _lib_path():
    """Shared-object path keyed on a source hash: rebuilt exactly when
    the source changes (mtimes are unreliable after a fresh checkout)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_NATIVE_DIR, f"libmarching-{digest}.so")


def _build_library(lib_path):
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, _SRC,
           "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib_path = _lib_path()
    if not os.path.exists(lib_path):
        _build_library(lib_path)
    lib = ctypes.CDLL(lib_path)
    lib.mc_extract.restype = ctypes.c_int64
    lib.mc_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
    ]
    lib.mc_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def marching_cubes(density: np.ndarray, iso: float, return_keys: bool = False):
    """Extract the iso-surface of a (nx, ny, nz) float32 density grid.

    Returns (verts (V, 3) float32 in grid-index coordinates,
    faces (F, 3) int32) — same contract as torchmcubes.marching_cubes
    (reference nerf2mesh.py:98).  With ``return_keys`` also returns the
    (V,) int64 canonical grid-edge id of each vertex, which
    ``weld_vertices`` uses for exact O(V log V) scalar dedup.
    """
    lib = _load()
    density = np.ascontiguousarray(density, np.float32)
    nx, ny, nz = density.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int32)()
    keys_p = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mc_extract(
        density.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, float(iso),
        ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(tris_p), ctypes.byref(nt),
        ctypes.byref(keys_p))
    if rc != 0:
        raise RuntimeError(f"mc_extract failed with code {rc}")
    try:
        verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).copy()
        faces = np.ctypeslib.as_array(tris_p, (nt.value, 3)).copy()
        keys = np.ctypeslib.as_array(keys_p, (nv.value,)).copy()
    finally:
        lib.mc_free(verts_p)
        lib.mc_free(tris_p)
        lib.mc_free(keys_p)
    if return_keys:
        return verts, faces, keys
    return verts, faces


def weld_vertices(verts: np.ndarray, faces: np.ndarray, decimals: int = 5,
                  keys: Optional[np.ndarray] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Merge duplicate vertices (the extractor emits per-triangle verts).

    With ``keys`` (the extractor's canonical edge ids, equal key <=>
    bit-identical position) the dedup is a 1-D int64 unique — ~100x
    faster at 256^3 than the positional row-unique fallback, which
    lexsorts float triples (that np.unique(axis=0) dominated the old
    397 s "marching" stage timing at 26M raw verts)."""
    if len(verts) == 0:
        return verts, faces
    if keys is not None:
        uniq_keys, first, inverse = np.unique(
            keys, return_index=True, return_inverse=True)
        return (verts[first].astype(np.float32),
                inverse[faces].astype(np.int32))
    key = np.round(verts, decimals)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    return uniq.astype(np.float32), inverse[faces].astype(np.int32)


def grid_interp(grid: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Trilinearly sample a (nx, ny, nz, C) grid at grid-index coords.

    jnp equivalent of torchmcubes.grid_interp (reference nerf2mesh.py:99).
    """
    import jax.numpy as jnp

    g = jnp.asarray(grid)
    v = jnp.asarray(verts)
    nx, ny, nz = g.shape[:3]
    v = jnp.clip(v, 0.0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.float32))
    v0 = jnp.floor(v).astype(jnp.int32)
    v0 = jnp.minimum(v0, jnp.asarray([nx - 2, ny - 2, nz - 2]))
    f = v - v0
    out = 0.0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = ((f[:, 0] if cx else 1 - f[:, 0])
                     * (f[:, 1] if cy else 1 - f[:, 1])
                     * (f[:, 2] if cz else 1 - f[:, 2]))
                out = out + w[:, None] * g[v0[:, 0] + cx, v0[:, 1] + cy,
                                           v0[:, 2] + cz]
    return np.asarray(out)


def verts_to_world(verts: np.ndarray, min_bound, max_bound,
                   resolution: int) -> np.ndarray:
    """Grid-index coords -> world coords over the scene bounds."""
    lo = np.asarray(min_bound, np.float32)
    hi = np.asarray(max_bound, np.float32)
    return lo + verts / (resolution - 1) * (hi - lo)


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray,
              colors: Optional[np.ndarray] = None):
    """Binary-little-endian PLY with optional per-vertex uchar colours."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(verts)}",
               "property float x", "property float y", "property float z"]
        if colors is not None:
            hdr += ["property uchar red", "property uchar green",
                    "property uchar blue"]
        hdr += [f"element face {len(faces)}",
                "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        if colors is not None:
            c8 = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            rec = np.zeros(len(verts),
                           dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec["xyz"] = verts
            rec["rgb"] = c8
            f.write(rec.tobytes())
        else:
            f.write(verts.tobytes())
        frec = np.zeros(len(faces), dtype=[("n", np.uint8), ("idx", np.int32, 3)])
        frec["n"] = 3
        frec["idx"] = faces
        f.write(frec.tobytes())


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
