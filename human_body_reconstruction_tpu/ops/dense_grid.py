"""Dense (un-hashed) coarse levels evaluated as MXU tensor-product matmuls.

Real Instant-NGP stores its coarse levels as dense grids (paper section 4:
levels with N_l**3 <= T are indexed directly, no hashing) — the reference
never implemented that and hashes every level
(/root/reference/hash_encoding.py:41-55).  This module provides the
capability TPU-first, and with a twist dictated by the hardware: on a v5e
every *random* table lookup costs one ~4 KB memory tile (~200M lookups/s
ceiling, docs/PERF_NOTES.md), while the MXU delivers ~10**6 bf16 FLOPs in
the same time.  So instead of gathering 8 corner values per point we
evaluate the trilinear interpolation as a dense tensor contraction:

    out[n, f] = sum_{i,j,k}  Wx[n,i] * Wy[n,j] * Wz[n,k] * G[i,j,k,f]

where each per-axis weight row (Wx etc.) has exactly two non-zeros
(1-frac at x0, frac at x0+1).  Contraction order:

    W_yz = Wy (x) Wz                     # (N, G*G)   vector ops
    T    = W_yz @ G.transpose(jk, i*f)   # (N, G*F)   ONE MXU matmul
    out  = sum_i Wx[n,i] * T[n,i,f]      # (N, F)     vector reduce

FLOPs per (point, level) = 2*G**3*F — cheaper than a single gather for
G <= ~60 (F=2), and the *backward* pass is the transposed matmul chain:
no scatter-add at all, which on this chip is the dominant training cost.
Gradients flow to the grid exactly (collision-free coarse levels); the
interpolation fractions are stop_gradient'ed to match the hash path
(reference hash_encoding.py:160 ``diff.detach()``).

The point axis is processed in fixed-size blocks via ``lax.map`` so the
(N, G*G) one-hot-pair intermediate never exceeds a few MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from human_body_reconstruction_tpu.utils.config import HashConfig


def grid_size(scale: float) -> int:
    """Corner-grid side length for a level of resolution ``scale``.

    Cells are floor(x_norm * scale) for x_norm in [0, 1], so the last
    corner index is floor(scale) + 1.
    """
    return int(np.floor(scale)) + 2


def dense_grid_sizes(cfg: HashConfig) -> list:
    """Side lengths G of the first ``cfg.dense_levels`` levels."""
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    scales = level_scales(cfg)
    return [grid_size(float(scales[l])) for l in range(cfg.dense_levels)]


def auto_dense_levels(cfg: HashConfig, flop_budget: float = 2.0 ** 19,
                      max_side: int = 64) -> int:
    """How many coarse levels are worth storing dense on a v5e.

    A level is dense-worthy while its per-point contraction cost
    (2*G^3*F FLOPs) stays under ``flop_budget`` — roughly half the MXU
    work that one random HBM gather's tile time buys (~10^6 bf16 FLOPs)
    — and the grid side stays VMEM-friendly.
    """
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    scales = level_scales(cfg)
    d = 0
    for l in range(cfg.num_levels):
        g = grid_size(float(scales[l]))
        if g > max_side or 2.0 * g ** 3 * cfg.features_per_level > flop_budget:
            break
        d += 1
    return d


def init_dense(key, cfg: HashConfig, dtype=jnp.float32):
    """Tuple of (G, G, G, F) grids for the dense levels, initialised
    U(-init_scale, init_scale) like the hash table (ref hash_encoding.py:32)."""
    grids = []
    for g in dense_grid_sizes(cfg):
        key, sub = jax.random.split(key)
        grids.append(jax.random.uniform(
            sub, (g, g, g, cfg.features_per_level), dtype=dtype,
            minval=-cfg.init_scale, maxval=cfg.init_scale))
    return tuple(grids)


def _axis_weights(x0, frac, g: int, dtype):
    """(N,) int cell + (N,) frac -> (N, g) two-hot interpolation row."""
    iota = jnp.arange(g, dtype=jnp.int32)[None, :]
    x0 = x0[:, None]
    frac = frac[:, None].astype(dtype)
    lo = (iota == x0).astype(dtype)
    hi = (iota == x0 + 1).astype(dtype)
    return lo * (1.0 - frac) + hi * frac


def _level_block(pts_block, grid, scale: float, compute_dtype):
    """TPM trilerp of one block of normalised points against one grid.

    pts_block: (B, 3) in [0, 1] (normalised scene coords).
    grid: (G, G, G, F).
    Returns (B, F) in the grid's dtype.
    """
    g, _, _, f = grid.shape
    xl = pts_block.astype(jnp.float32) * scale                     # (B, 3)
    x0f = jnp.floor(xl)
    frac = jax.lax.stop_gradient(jnp.clip(xl - x0f, 0.0, 1.0))
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, g - 2)

    wx = _axis_weights(x0[:, 0], frac[:, 0], g, compute_dtype)     # (B, G)
    wy = _axis_weights(x0[:, 1], frac[:, 1], g, compute_dtype)
    wz = _axis_weights(x0[:, 2], frac[:, 2], g, compute_dtype)

    w_yz = (wy[:, :, None] * wz[:, None, :]).reshape(-1, g * g)    # (B, G^2)
    # (jk, i*f) matrix of the grid: out of the einsum
    #   T[n, i, f] = sum_jk W_yz[n, jk] * G[i, j, k, f]
    mat = grid.transpose(1, 2, 0, 3).reshape(g * g, g * f)
    mat = mat.astype(compute_dtype)
    t = jax.lax.dot(w_yz, mat,
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)            # (B, G*F)
    t = t.reshape(-1, g, f)
    out = jnp.sum(t * wx[:, :, None].astype(jnp.float32), axis=1)  # (B, F)
    return out.astype(grid.dtype)


def dense_encode(grids, x, mu, sigma, cfg: HashConfig,
                 block: int = 0):
    """Encode points against the dense coarse levels.

    Args:
      grids: tuple of (G, G, G, F) arrays (one per dense level, coarsest
        first — levels 0..cfg.dense_levels-1).
      x: (N, dim) world points.
      mu, sigma: scene normalisation (same as the hash path).
      block: point-block size for the lax.map sweep; 0 picks one that
        caps the (block, G^2) intermediate at ~2M elements.
    Returns:
      (N, dense_levels * F) features, dtype of the grids.
    """
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    assert cfg.dim == 3, "dense grids are 3-D"
    assert len(grids) == cfg.dense_levels
    scales = level_scales(cfg)
    n = x.shape[0]
    xn = (x.astype(jnp.float32) - mu) / sigma                      # (N, 3)

    compute_dtype = jnp.bfloat16 if cfg.dense_bf16 else jnp.float32
    max_g = max(g.shape[0] for g in grids)
    if block <= 0:
        # cap the (block, G^2) pair-weight intermediate at ~2**25
        # elements (~128 MB fp32 in HBM): big blocks keep the lax.map
        # trip count low — hundreds of tiny sequential matmul dispatches
        # dominated the first TPU measurement (scripts/tpu_profile_step.py)
        block = int(max(1024, min(n, (2 ** 25) // (max_g * max_g))))
        block = max(1024, (block // 1024) * 1024)
    pad = (-n) % block
    xp = jnp.pad(xn, ((0, pad), (0, 0))) if pad else xn
    nblk = xp.shape[0] // block
    xb = xp.reshape(nblk, block, 3)

    # remat: without it the backward of the lax.map stores every block's
    # (block, G^2) pair-weight intermediate — nblk * levels * ~60 MB
    # blew past HBM at L=16/F=2/dense_levels=4 (measured 19.9 G of
    # 15.75 G at compile).  Recomputing the two-hot weights is a few
    # vector ops per block; the matmul chain is what backward needs.
    @jax.checkpoint
    def per_block(pts):
        outs = [_level_block(pts, grids[l], float(scales[l]), compute_dtype)
                for l in range(len(grids))]
        return jnp.concatenate(outs, axis=-1)                      # (B, D*F)

    if nblk == 1:
        out = per_block(xb[0])
    else:
        out = jax.lax.map(per_block, xb).reshape(nblk * block, -1)
    return out[:n]
