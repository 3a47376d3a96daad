"""Occupancy grid for empty-space culling — working, unlike the reference.

The reference scaffolds a 256-cube boolean grid (vol_renderer.py:106-140)
whose update call is dead-coded (vol_renderer.py:204) and whose trainer
path forces updates off (train_hash2.py:202-206), so culling never
actually happens.  This module provides the *working* capability,
TPU-first:

  * the grid is a float density EMA (Instant-NGP section 5 style) plus a
    derived boolean mask,
  * lookups are a dense gather -> multiplicative density mask (static
    shapes; no ragged boolean indexing as in vol_renderer.py:211-216),
  * updates evaluate the density branch on a random subset of jittered
    cell centres each round and scatter-max into the EMA.

Coordinates use the same normalisation as the reference grid
(vol_renderer.py:119-121): cell = floor((x - mu) / sigma * G), clipped.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class OccupancyGrid(NamedTuple):
    density: jnp.ndarray   # (G, G, G) float32 density EMA
    mask: jnp.ndarray      # (G, G, G) float32 in {0.0, 1.0} — float rather
                           # than bool: the mask is consumed by gathers and
                           # multiplies, and bool gathers measured ~2x
                           # slower on TPU
    threshold: jnp.ndarray # scalar


def init_grid(resolution: int = 256, threshold: float = 0.01) -> OccupancyGrid:
    """All-occupied at init (reference vol_renderer.py:107 init all-True)."""
    g = resolution
    return OccupancyGrid(
        density=jnp.full((g, g, g), jnp.inf, jnp.float32),
        mask=jnp.ones((g, g, g), jnp.float32),
        threshold=jnp.asarray(threshold, jnp.float32),
    )


def cell_indices(points, mu, sigma, resolution: int):
    """World points -> integer cell coords, clipped into the grid."""
    xn = (points - mu) / sigma * resolution
    return jnp.clip(xn.astype(jnp.int32), 0, resolution - 1)


def lookup(grid: OccupancyGrid, points, mu, sigma):
    """Multiplicative mask for sample points: 1.0 where occupied.

    Capability parity with reference ``get_mask`` (vol_renderer.py:133-140)
    but returned as float for masking density instead of gather-compacting
    the point set.
    """
    g = grid.mask.shape[0]
    c = cell_indices(points, mu, sigma, g)
    # flat 1-D take: the multi-dim indexed gather lowers ~2x slower on
    # TPU (same lesson as the hash table, docs/PERF_NOTES.md)
    flat = (c[..., 0] * g + c[..., 1]) * g + c[..., 2]
    return jnp.take(grid.mask.reshape(-1), flat)


def update(grid: OccupancyGrid, density_fn, key, mu, sigma, *,
           num_cells: int = 2 ** 18, decay: float = 0.95) -> OccupancyGrid:
    """One culling round: decay the EMA, re-evaluate a random cell subset.

    Args:
      density_fn: maps (N, 3) world points -> (N,) non-negative density.
      num_cells: cells re-sampled this round (static).  The default
        covers 12.5% of a 128^3 grid but only 1.6% of 256^3 per round —
        SAFE either way (never-visited cells stay inf = occupied, so
        under-coverage only delays culling, never mis-culls), and cheap
        on the Trainer's 15-step cadence.  Callers that need a big grid
        to CONVERGE fast on a short budget (quality matrix, speedrun)
        pass an explicitly scaled count instead; scaling the default
        would 8x the refresh cost of every default-256^3 CLI run.
    Returns:
      updated OccupancyGrid (functional).
    """
    g = grid.density.shape[0]
    k1, k2 = jax.random.split(key)
    flat_idx = jax.random.randint(k1, (num_cells,), 0, g * g * g)
    cz = flat_idx % g
    cy = (flat_idx // g) % g
    cx = flat_idx // (g * g)
    cells = jnp.stack([cx, cy, cz], axis=-1).astype(jnp.float32)
    jitter = jax.random.uniform(k2, (num_cells, 3))
    # jittered cell centre back in world coordinates
    pts = (cells + jitter) / g * sigma + mu
    d = jnp.maximum(density_fn(pts), 0.0)

    decayed = jnp.where(jnp.isinf(grid.density), grid.density,
                        grid.density * decay)
    # visited cells: EMA takes max(decayed, new); inf (never-visited) cells
    # get the fresh estimate directly.
    old = decayed[cx, cy, cz]
    new = jnp.where(jnp.isinf(old), d, jnp.maximum(old, d))
    density = decayed.at[cx, cy, cz].set(new)
    mask = (jnp.isinf(density)
            | (density > grid.threshold)).astype(jnp.float32)
    return OccupancyGrid(density=density, mask=mask,
                         threshold=grid.threshold)


def occupied_fraction(grid: OccupancyGrid):
    return jnp.mean(grid.mask)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "num_cells", "decay"))
def update_from_field(grid: OccupancyGrid, params, scene, key, cfg,
                      num_cells: int = 2 ** 18,
                      decay: float = 0.95) -> OccupancyGrid:
    """One culling round against the model's own density field, fully
    jitted as ONE dispatch.

    :func:`update` with an eager ``density_fn`` closure issues dozens of
    individual device ops per refresh; through this environment's
    remote-execution tunnel each op pays ~35 ms of dispatch latency, so
    an eager refresh costs seconds — at the Trainer's 15-step default
    cadence that was the dominant cost of the whole training loop.
    Passing ``params`` as a traced argument (instead of closing over
    them) makes the refresh one cached executable.
    """
    from human_body_reconstruction_tpu.models import nerf  # circular-safe

    return update(grid,
                  lambda p: nerf.density_only(params, scene, p, cfg),
                  key, scene["mu"], scene["sigma"],
                  num_cells=num_cells, decay=decay)
