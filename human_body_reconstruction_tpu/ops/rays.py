"""Camera ray generation and scene bounds (pure jnp).

Rebuilds the capability of reference ``helper.py:176-208`` (``get_od``)
and ``helper.py:109-141`` (``find_bounding_box``) as vectorised,
jit-friendly functions.  Convention matches the reference / NeRF-synthetic:
pixel (i, j) maps to camera-space direction
``((i - cx)/fx, -(j - cy)/fy, -1)`` rotated by ``c2w[:3, :3]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_dirs(i, j, K):
    """Camera-space (unnormalised) direction for pixel centres (i, j).

    Args:
      i: x pixel coordinate(s), any shape.
      j: y pixel coordinate(s), same shape.
      K: (3, 3) intrinsics [[fx,0,cx],[0,fy,cy],[0,0,1]].
    Returns:
      dirs: (..., 3) camera-space directions.
    """
    x = (i - K[0, 2]) / K[0, 0]
    y = -(j - K[1, 2]) / K[1, 1]
    z = -jnp.ones_like(x)
    return jnp.stack([x, y, z], axis=-1)


def rays_for_pixels(i, j, K, c2w):
    """World-space rays through the given pixels of one camera.

    Vectorised equivalent of reference ``get_od`` (helper.py:176-208), but
    for an arbitrary pixel subset so ray generation can run on-device per
    training batch instead of precomputing every ray of the dataset.

    Args:
      i, j: (...,) pixel coordinates.
      K: (3, 3) intrinsics.
      c2w: (..., 4, 4) or (4, 4) camera-to-world matrices, broadcastable
        against the pixel batch.
    Returns:
      (rays_o, rays_d, dir_norm): origins (..., 3), *unit* directions
      (..., 3) and the pre-normalisation direction norm (..., 1) used to
      convert parametric dt into metric distance (reference helper.py:71).
    """
    dirs = pixel_dirs(i.astype(jnp.float32), j.astype(jnp.float32), K)
    R = c2w[..., :3, :3]
    rays_d = jnp.einsum("...ab,...b->...a", R, dirs)
    rays_o = jnp.broadcast_to(c2w[..., :3, 3], rays_d.shape)
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d / dir_norm, dir_norm


def full_image_rays(H: int, W: int, K, c2w):
    """All H*W rays of one camera, row-major (matches reference 'xy'
    meshgrid + reshape ordering, helper.py:193-199)."""
    j, i = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    return rays_for_pixels(i.reshape(-1), j.reshape(-1), K, c2w)


def scene_bounds(H: int, W: int, K, c2ws, near: float, far: float,
                 margin: float = 1.5):
    """Axis-aligned bounds of all rays at t in {near, far+margin}.

    Equivalent capability to reference ``find_bounding_box``
    (helper.py:109-141) which walks a DataLoader accumulating per-axis
    min/max on rays evaluated at t = near and t = far + 1.5; here it is a
    single vectorised reduction over the corner pixels *and* full pixel
    grid of every pose.

    Args:
      c2ws: (N, 4, 4) stacked camera-to-world matrices.
    Returns:
      (min_bound, max_bound): (3,) float32 each.
    """
    t = jnp.asarray([near, far + margin], dtype=jnp.float32)
    j, i = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    i = i.reshape(-1)
    j = j.reshape(-1)
    o, d, _ = rays_for_pixels(i, j, K, c2ws[:, None, :, :])
    pts = o[..., None, :] + d[..., None, :] * t[None, None, :, None]
    pts = pts.reshape(-1, 3)
    min_bound = jnp.min(pts, axis=0)
    max_bound = jnp.max(pts, axis=0)
    return min_bound, max_bound
