"""Alpha compositing along rays (pure jnp, static shapes).

Rebuilds reference ``calc_color`` (helper.py:53-107) and
``cumprod_exclusive`` (helper.py:268-291):

  dt_i   = t_{i+1} - t_i  (last dt = 0), scaled by |d| (metric distance)
  sigma  = max(sigma, sigma_clip_min)          (helper.py:76)
  alpha  = 1 - exp(-sigma * dt)
  T_i    = exp(-sum_{j<i} sigma_j dt_j)        (exclusive transmittance,
                                                helper.py:93-95 roll trick)
  w_i    = T_i * alpha_i
  C      = sum_i w_i * rgb_i

The SDF branch follows helper.py:80-85: phi = sigmoid(b * s),
alpha_i = relu(1 - phi_{i+1}/phi_i), T = exclusive cumprod(1 - alpha).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def exclusive_cumsum(x, axis: int = -1):
    """Cumulative sum shifted right by one with a leading zero."""
    c = jnp.cumsum(x, axis=axis)
    zero = jnp.zeros_like(jnp.take(c, jnp.asarray([0]), axis=axis))
    rest = jnp.take(c, jnp.arange(x.shape[axis] - 1), axis=axis)
    return jnp.concatenate([zero, rest], axis=axis)


def exclusive_cumprod(x, axis: int = -1):
    """tf.math.cumprod(..., exclusive=True) (reference helper.py:268-291)."""
    c = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jnp.take(c, jnp.asarray([0]), axis=axis))
    rest = jnp.take(c, jnp.arange(x.shape[axis] - 1), axis=axis)
    return jnp.concatenate([one, rest], axis=axis)


def composite(t, rgb, sigma, dir_norm=None, *, sigma_clip_min: float = -10.0,
              white_background: bool = False, dt=None):
    """Emission-absorption compositing.

    Args:
      t: (..., S) sample depths (sorted).
      rgb: (..., S, 3) per-sample colour.
      sigma: (..., S) per-sample density.
      dir_norm: optional (..., 1) or (...,) pre-normalisation ray-direction
        norm; scales dt into metric distance (reference helper.py:71).
      dt: optional explicit per-sample intervals (..., S); overrides the
        default neighbour-difference (used by occupancy compaction, where
        intervals come from the full sample ladder).
    Returns:
      (color (..., 3), weights (..., S), trans (..., S)).
    """
    if dt is None:
        dt = jnp.concatenate(
            [t[..., 1:] - t[..., :-1], jnp.zeros_like(t[..., :1])], axis=-1)
    if dir_norm is not None:
        dn = jnp.asarray(dir_norm)
        if dn.ndim == t.ndim:           # (..., 1)
            dt = dt * dn
        else:                            # (...,)
            dt = dt * dn[..., None]
    sigma = jnp.maximum(sigma, sigma_clip_min)
    prod = sigma * dt
    alpha = 1.0 - jnp.exp(-prod)
    trans = jnp.exp(-exclusive_cumsum(prod, axis=-1))
    weights = trans * alpha
    color = jnp.sum(weights[..., None] * rgb, axis=-2)
    if white_background:
        acc = jnp.sum(weights, axis=-1, keepdims=True)
        color = color + (1.0 - acc)
    return color, weights, trans


def composite_sdf(t, rgb, sdf, b, dir_norm=None):
    """NeuS-style compositing from an SDF-like field (reference
    helper.py:80-85 + VarModel helper.py:13-21).

    phi = sigmoid(b * s); alpha_i = relu(1 - phi_{i+1} / phi_i); last
    alpha = 0; T = exclusive cumprod(1 - alpha).

    Args:
      sdf: (..., S) the "density" channel interpreted as a signed field.
      b: scalar learned sharpness (VarModel.b).
    Returns:
      (color (..., 3), weights (..., S), trans (..., S)).
    """
    del dir_norm  # the reference SDF branch ignores dt entirely
    phi = jnp.clip(jax_sigmoid(b * sdf), 1e-6, 1.0)
    ratio = phi[..., 1:] / phi[..., :-1]
    alpha = jnp.maximum(1.0 - ratio, 0.0)
    alpha = jnp.concatenate([alpha, jnp.zeros_like(alpha[..., :1])], axis=-1)
    trans = exclusive_cumprod(1.0 - alpha, axis=-1)
    weights = trans * alpha
    color = jnp.sum(weights[..., None] * rgb, axis=-2)
    return color, weights, trans


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def psnr(pred, target, max_val: float = 1.0):
    """PSNR (reference helper.py:301-304, plot_psnr.py:12-20)."""
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / mse)
