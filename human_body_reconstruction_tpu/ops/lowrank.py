"""CP low-rank factor-line encoding — the all-MXU fine-level encoder.

The multiresolution hash encoder's cost on a v5e is entirely its random
memory traffic: every table gather and every backward scatter pays a
~4 KB memory tile (docs/PERF_NOTES.md), capping any hash-grid variant
at the chip's ~200M lookups/s random-access ceiling.  The dense-grid
path (ops/dense_grid.py) escapes that ceiling for COARSE levels by
evaluating trilerp as tensor-product matmuls, but its FLOPs grow with
G^3 so it stops paying around G ~ 64.

This module escapes the ceiling for the FINE levels by changing the
representation instead of the access path (the round-1 conclusion:
"the 5M target is reachable only by changing the encoding itself" —
docs/PERF_NOTES.md): each level stores a rank-R CP (CANDECOMP/PARAFAC)
factorisation of its feature grid — three 1-D factor LINES per level
(TensoRF's CP decomposition, Chen et al. 2022, re-shaped for the MXU)

    feat_l[r](x, y, z) = a_l[x, r] * b_l[y, r] * c_l[z, r]

with each line linearly interpolated at its level's resolution.  The
line interpolation of ALL levels is ONE batched matmul per axis:

    W[axis]  : (B, sum_l G_l)   two-hot rows (1-frac at x0, frac at x0+1,
                                 in level l's column segment)
    M[axis]  : (sum_l G_l, L*R) block-diagonal factor matrix (level l's
                                 lines in rows [off_l, off_l+G_l), columns
                                 [l*R, (l+1)*R))
    T[axis]  = W[axis] @ M[axis]                       # ONE MXU matmul
    out      = T[x] * T[y] * T[z]                      # (B, L*R)

Zero gathers, zero scatters: the backward pass is the transposed matmul
(dM = W^T dT) plus elementwise product-rule terms, all MXU/VPU work.
Unlike the hash paths there are no collisions, no stochastic-corner
estimators and no quantisation — training forward == eval forward,
exactly.  FLOPs per (point, level, axis) = 2 * G_l * R; the block-
diagonal layout keeps all 128 output lanes busy (a per-level batched
matmul with R=16 outputs would waste 7/8 of the MXU).

Capability parity: replaces the fine (hashed) levels of the reference
encoder (/root/reference/hash_encoding.py:41-55) — resolutions still
follow the N_l = n_min * b**l ladder; coarse levels can stay dense 3-D
grids via cfg.dense_levels exactly as with the hash variants.

The point axis is swept in fixed-size blocks via ``lax.map`` with
``jax.checkpoint`` so the (block, sum_G) two-hot intermediate is
rebuilt in the backward pass instead of stored per block (the same
HBM-OOM lesson as dense_grid.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from human_body_reconstruction_tpu.utils.config import HashConfig


def cp_line_sizes(cfg: HashConfig) -> list:
    """Side length G_l of each CP level's factor lines (fine levels only:
    levels cfg.dense_levels .. num_levels-1).  Cells are
    floor(x_norm * scale), so the last corner index is floor(scale)+1."""
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    scales = level_scales(cfg)
    return [int(np.floor(float(scales[l]))) + 2
            for l in range(cfg.dense_levels, cfg.num_levels)]


def init_lines(key, cfg: HashConfig, dtype=jnp.float32):
    """Tuple (one per CP level) of (dim, G_l, R) factor lines.

    Init scale: features are PRODUCTS of ``dim`` line entries, so lines
    are drawn U(-s, s) with s = cfg.cp_init_scale (default 0.1; the
    product magnitude ~s**dim ~ 1e-3 keeps early density/colour outputs
    small, same regime as the hash table's U(-1e-4, 1e-4), while the
    gradient to each line entry — proportional to the product of the
    OTHER two — stays ~s**(dim-1), far from the vanishing-gradient
    regime of cube-rooted tiny inits).
    """
    out = []
    for g in cp_line_sizes(cfg):
        key, sub = jax.random.split(key)
        out.append(jax.random.uniform(
            sub, (cfg.dim, g, cfg.cp_rank), dtype=dtype,
            minval=-cfg.cp_init_scale, maxval=cfg.cp_init_scale))
    return tuple(out)


def _factor_matrix(lines, offs, total_g: int, rank: int, dtype):
    """Stack per-level (dim, G_l, R) lines into the block-diagonal
    (dim, sum_G, L*R) factor matrix (level l at rows offs[l]:, cols l*R:)."""
    dim = lines[0].shape[0]
    mat = jnp.zeros((dim, total_g, len(lines) * rank), dtype)
    for l, ln in enumerate(lines):
        mat = jax.lax.dynamic_update_slice(
            mat, ln.astype(dtype), (0, offs[l], l * rank))
    return mat


def _two_hot(x0, frac, g: int, dtype):
    """(dim, B) int cells + fracs -> (dim, B, g) two-hot interp rows."""
    iota = jnp.arange(g, dtype=jnp.int32)[None, None, :]
    x0 = x0[..., None]
    frac = frac[..., None].astype(dtype)
    lo = (iota == x0).astype(dtype)
    hi = (iota == x0 + 1).astype(dtype)
    return lo * (1.0 - frac) + hi * frac


def cp_encode(lines, x, mu, sigma, cfg: HashConfig, block: int = 0):
    """Encode points against the CP factor lines of the fine levels.

    Args:
      lines: tuple of (dim, G_l, R) arrays (one per CP level, coarsest
        first — levels cfg.dense_levels .. num_levels-1).
      x: (N, dim) world points.
      mu, sigma: scene normalisation (same convention as the hash path,
        reference hash_encoding.py:154).
      block: point-block size for the lax.map sweep; 0 auto-sizes so the
        (block, sum_G) two-hot intermediate stays a few MB.
    Returns:
      (N, n_cp_levels * cp_rank) features, float32.
    """
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    impl = cfg.cp_impl
    if impl == "auto":
        # The Pallas kernel computes in bf16 (W tiles and factor
        # matrices are built bf16 for the MXU, cp_pallas.py); routing a
        # dense_bf16=False config through it would silently change the
        # numerics the flag promises, so 'auto' only picks the kernel
        # when the config asked for bf16 compute anyway.  Explicitly
        # setting cp_impl='pallas' opts into bf16 regardless.
        impl = ("pallas"
                if jax.default_backend() == "tpu" and cfg.dense_bf16
                else "xla")
    if impl == "pallas":
        from human_body_reconstruction_tpu.ops import cp_pallas

        return cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg)

    n_lvl = len(lines)
    assert n_lvl == cfg.num_levels - cfg.dense_levels
    # rank comes from the lines themselves, not cfg.cp_rank: under rank
    # parallelism (parallel/level_parallel.py) each chip holds a
    # (dim, G_l, R/n) RANK SLICE of every level and encodes it with the
    # same code path
    rank = lines[0].shape[-1]
    sizes = cp_line_sizes(cfg)
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    total_g = int(offs[-1])
    scales = np.asarray(level_scales(cfg)[cfg.dense_levels:], np.float32)
    n = x.shape[0]
    dim = cfg.dim
    compute_dtype = jnp.bfloat16 if cfg.dense_bf16 else jnp.float32

    xn = ((x.astype(jnp.float32) - mu) / sigma)                    # (N, dim)

    # the factor matrix is built ONCE per call (outside the block sweep);
    # cotangents from every block accumulate into it through lax.map
    mat = _factor_matrix(lines, offs, total_g, rank, compute_dtype)

    if block <= 0:
        block = int(max(1024, min(n, (2 ** 23) // max(total_g, 1))))
        block = max(1024, (block // 1024) * 1024)
    pad = (-n) % block
    xp = jnp.pad(xn, ((0, pad), (0, 0))) if pad else xn
    nblk = xp.shape[0] // block
    xb = xp.reshape(nblk, block, dim)

    scales_j = jnp.asarray(scales)                                 # (L,)
    offs_j = jnp.asarray(offs[:-1])                                # (L,)
    sizes_j = jnp.asarray(sizes, jnp.int32)

    # remat: the backward only needs the matmul chain; the two-hot rows
    # are a few vector ops to rebuild (same HBM lesson as dense_grid.py)
    @jax.checkpoint
    def per_block(pts):                                            # (B, dim)
        xl = pts.T[:, :, None] * scales_j[None, None, :]           # (dim,B,L)
        x0f = jnp.floor(xl)
        frac = jax.lax.stop_gradient(jnp.clip(xl - x0f, 0.0, 1.0))
        x0 = jnp.clip(x0f.astype(jnp.int32), 0,
                      sizes_j[None, None, :] - 2)                  # (dim,B,L)
        # per-level two-hot rows, concatenated along the column axis into
        # the (dim, B, sum_G) interp matrix matching the block-diagonal
        # factor matrix
        w = jnp.concatenate(
            [_two_hot(x0[..., l], frac[..., l], sizes[l], compute_dtype)
             for l in range(n_lvl)], axis=-1)                      # (dim,B,ΣG)
        t = jax.lax.dot_general(
            w, mat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                    # (dim,B,LR)
        out = t[0]
        for d in range(1, dim):
            out = out * t[d]
        return out                                                 # (B, L*R)

    if nblk == 1:
        out = per_block(xb[0])
    else:
        out = jax.lax.map(per_block, xb).reshape(nblk * block, -1)
    return out[:n]


def cp_encode_reference(lines, x, mu, sigma, cfg: HashConfig):
    """Slow direct-gather reference implementation (tests only): per
    level, lerp each axis line at the point and multiply across axes."""
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    scales = level_scales(cfg)[cfg.dense_levels:]
    sizes = cp_line_sizes(cfg)
    xn = (x.astype(jnp.float32) - mu) / sigma                      # (N, dim)
    outs = []
    for l, ln in enumerate(lines):
        g = sizes[l]
        xl = xn * float(scales[l])                                 # (N, dim)
        x0f = jnp.floor(xl)
        frac = jnp.clip(xl - x0f, 0.0, 1.0)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, g - 2)
        feat = 1.0
        for d in range(cfg.dim):
            lo = ln[d][x0[:, d]]                                   # (N, R)
            hi = ln[d][x0[:, d] + 1]
            feat = feat * (lo * (1.0 - frac[:, d:d + 1])
                           + hi * frac[:, d:d + 1])
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)
