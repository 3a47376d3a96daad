"""Ray sampling: stratified + true inverse-CDF hierarchical (pure jnp).

Rebuilds reference ``strat_sampler`` (helper.py:210-237) and
``hierarchical_sampling`` (helper.py:23-51).  Two deliberate fixes over
the reference (SURVEY.md "known defects"):

  * the reference draws ONE jitter vector shared by every ray in the
    batch (``t`` has shape (num_samples,)); we jitter per ray by default,
  * the reference's "hierarchical" resampler indexes an unrelated
    uniform sample vector by CDF bucket (helper.py:43-45) instead of
    inverting the CDF; we implement the standard piecewise-linear
    inverse-CDF resampling (sample_pdf from the NeRF paper).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_ts(key, batch_shape, near, far, num_samples: int,
                  per_ray_jitter: bool = True, log_sampling: bool = False,
                  jitter: bool = True, dtype=jnp.float32):
    """Stratified samples along rays.

    Returns t of shape batch_shape + (num_samples,).  With
    ``per_ray_jitter=False`` and ``batch_shape=()`` this reproduces the
    reference's single shared t-vector (helper.py:234-235):
    ``t = linspace(tn, tf, S) + rand(S) * (tf - tn) / S``.
    """
    near = jnp.asarray(near, dtype)
    far = jnp.asarray(far, dtype)
    if log_sampling:
        base = jnp.linspace(jnp.log(near), jnp.log(far), num_samples,
                            dtype=dtype)
        step = (jnp.log(far) - jnp.log(near)) / num_samples
    else:
        base = jnp.linspace(near, far, num_samples, dtype=dtype)
        step = (far - near) / num_samples
    if jitter:
        shape = (tuple(batch_shape) if per_ray_jitter else ()) + (num_samples,)
        u = jax.random.uniform(key, shape, dtype=dtype)
    else:
        u = jnp.zeros((num_samples,), dtype=dtype)
    t = base + u * step
    if log_sampling:
        t = jnp.exp(t)
    return jnp.broadcast_to(t, tuple(batch_shape) + (num_samples,))


def sample_pdf(key, bins, weights, num_samples: int, *,
               deterministic: bool = False, eps: float = 1e-5, u=None,
               stratified: bool = False):
    """Inverse-CDF sampling of a piecewise-constant pdf (per ray).

    Args:
      bins: (..., S) sorted bin positions (coarse t values).
      weights: (..., S-1) non-negative bin weights.
      num_samples: number of new samples to draw per ray.
      stratified: draw u_i = (i + xi_i)/K (one jittered draw per CDF
        stratum) instead of iid uniforms.  Strictly lower-variance for
        the rendering integral, and since u is then increasing and the
        inverse CDF is monotone, the returned t are ALREADY SORTED —
        callers can skip their per-ray sort (occupancy_guided_ts does).
    Returns:
      (..., num_samples) new t values within [bins[0], bins[-1]].
    """
    weights = jnp.maximum(weights, 0.0) + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if u is not None:                    # injectable for edge-case tests
        u = jnp.broadcast_to(jnp.asarray(u),
                             cdf.shape[:-1] + (num_samples,))
    elif deterministic:
        u = jnp.linspace(0.0, 1.0 - 1e-6, num_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    elif stratified:
        xi = jax.random.uniform(key, cdf.shape[:-1] + (num_samples,),
                                maxval=1.0 - 1e-6)
        u = (jnp.arange(num_samples, dtype=jnp.float32) + xi) / num_samples
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (num_samples,),
                               maxval=1.0 - 1e-6)

    # Gather-free inverse CDF: random per-(ray, sample) picks pay one
    # ~4 KB memory tile EACH on TPU (docs/PERF_NOTES.md), so instead of
    # searchsorted + 4x take_along_axis we compute each picked value as
    # a masked reduction over the (small) bin axis — XLA fuses the
    # broadcast-compare-select-reduce into streaming vector code.  Exact
    # because cdf is strictly increasing (the eps floor keeps every pdf
    # entry positive) and bins are sorted: the masked max over
    # {j : u >= cdf_j} IS cdf[searchsorted(u)-1], etc.  The below-set is
    # never empty (cdf_0 = 0 <= u) and the above-set is never empty
    # (u < 1 = cdf_last).
    # The below-set always contains j=0 (cdf_0 = 0 <= u).  The above-set
    # can be EMPTY when floating-point cumsum leaves cdf[-1] slightly
    # below u (~1e-7 events — but certain at millions of samples/step):
    # clamp the empty-min's +inf to the last bin, mirroring the old
    # formulation's index clip.
    ge = u[..., None, :] >= cdf[..., :, None]          # (..., S, K)
    cdf_col = cdf[..., :, None]
    bins_col = bins[..., :, None]
    neg = -jnp.inf
    pos = jnp.inf
    cdf_below = jnp.max(jnp.where(ge, cdf_col, neg), axis=-2)
    cdf_above = jnp.minimum(jnp.min(jnp.where(ge, pos, cdf_col), axis=-2),
                            cdf[..., -1:])
    bins_below = jnp.max(jnp.where(ge, bins_col, neg), axis=-2)
    bins_above = jnp.minimum(jnp.min(jnp.where(ge, pos, bins_col), axis=-2),
                             bins[..., -1:])

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-8, 1.0, denom)
    frac = (u - cdf_below) / denom
    return bins_below + frac * (bins_above - bins_below)


def occupancy_guided_ts(key, rays_o, rays_d, occ, mu, sigma, near, far,
                        num_samples: int, num_probe: int = 0,
                        eps: float = 1e-3, jitter: bool = True,
                        explore_frac: float = 0.05,
                        probe_jitter: bool = False,
                        dt_mode: str = "clip",
                        stratified: bool = False):
    """Occupancy-guided sample placement (NerfAcc-style, TPU-static).

    Replaces the fixed top-K truncation of ``compact_samples`` with
    probabilistic placement: probe ``num_probe`` uniform intervals of
    [near, far] against the occupancy grid, build a per-ray
    piecewise-constant pdf over the OCCUPIED intervals, and draw
    ``num_samples`` samples by inverse CDF.  Rays with more occupied
    span than the budget spread samples proportionally instead of losing
    their tail (the truncation risk of top-K compaction); fully-empty
    rays fall back to uniform (their densities are masked to zero
    downstream anyway).

    Returns (t (B, K) sorted, dt (B, K)).  ``dt_mode``:

      * ``"clip"``: dt runs to the next sample but is clipped at the
        sample's probe-interval boundary, so an occupied sample's
        density is never integrated across the empty gap to the next
        sample.  BIASED LOW once samples are sparser than probe
        intervals (the interval-end -> next-sample gap is dropped):
        training-time optical depth is underestimated, the field
        compensates with inflated density, and exact-ladder eval then
        overshoots (measured: the 128-probe convergence inversion,
        docs/PERF_NOTES.md).
      * ``"mass"``: importance-weighted dt — each sample represents its
        1/K share of the ray's placement mass, dt_i = h*W/(K*m_j(i))
        with W the ray's total mass and m_j(i) the sample's interval
        mass.  Unbiased Monte-Carlo estimator of the occupied-region
        integral for any K/probe ratio; exploration samples (tiny bin
        mass -> huge weight) are clipped to one interval width for
        stability.
    """
    M = num_probe or 2 * num_samples
    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    h = (far - near) / M
    if probe_jitter:
        # Each interval is classified by ONE point lookup; a fixed
        # midpoint repeats the same misclassification (thin structure
        # the midpoint misses) every step.  Randomising the probe point
        # within its interval per ray per step makes an interval with
        # occupied fraction p be classified occupied with probability
        # ~p, decorrelating the errors across steps.
        kp, key = jax.random.split(key)
        u = jax.random.uniform(kp, rays_o.shape[:-1] + (M,))        # (B, M)
        tm = near + (jnp.arange(M, dtype=jnp.float32) + u) * h      # (B, M)
        pts = (rays_o[:, None, :]
               + rays_d[:, None, :] * tm[..., None])                # (B, M, 3)
    else:
        tm = near + (jnp.arange(M, dtype=jnp.float32) + 0.5) * h    # (M,)
        pts = (rays_o[:, None, :]
               + rays_d[:, None, :] * tm[None, :, None])            # (B, M, 3)
    from human_body_reconstruction_tpu.ops import occupancy as occ_lib

    m = occ_lib.lookup(occ, pts, mu, sigma)                         # (B, M)
    # Exploration floor: route ~explore_frac of each ray's sample mass
    # to its EMPTY-marked intervals.  Without this, a cell the grid
    # culled early never receives training samples, its density can
    # never rise, and the culling becomes permanent even when wrong
    # (measured on the hard textured scene: guided-only training
    # plateaued 7 dB below the unculled modes, quality_matrix.json).
    # Per-ray floor c solves  c*(M-n_occ) = f/(1-f) * n_occ.
    if explore_frac > 0.0:
        n_occ = jnp.sum(m, axis=-1, keepdims=True)                  # (B, 1)
        f = explore_frac
        c = (f / (1.0 - f)) * n_occ / jnp.maximum(M - n_occ, 1.0)
        # floor the EMPTY intervals only — adding c everywhere would
        # inflate the occupied mass too and undershoot the target
        # fraction (and for a fully-occupied ray c is huge but m==1
        # everywhere makes this a no-op, as it should be)
        m = m + c * (1.0 - m)
    bins = near + jnp.arange(M + 1, dtype=jnp.float32) * h          # (M+1,)
    bins = jnp.broadcast_to(bins, m.shape[:-1] + (M + 1,))
    t = sample_pdf(key, bins, m, num_samples, deterministic=not jitter,
                   eps=eps, stratified=stratified)
    if jitter and not stratified:
        # iid uniforms land unordered; stratified/deterministic u is
        # increasing and the inverse CDF is monotone, so t arrives
        # sorted and the (per-ray, VPU-serial) sort is skipped
        t = jnp.sort(t, axis=-1)                                    # (B, K)
    interval = jnp.floor((t - near) / h)                            # (B, K)
    if dt_mode == "mass":
        K = num_samples
        W = jnp.sum(m, axis=-1, keepdims=True)                      # (B, 1)
        # interval mass at each sample, gather-free: random (B, K)
        # picks from (B, M) would each pay the ~4KB tile price
        # (docs/PERF_NOTES.md); a one-hot broadcast-reduction is VPU
        # work instead, same trick as sample_pdf's inverse CDF.
        onehot = (interval[..., None]
                  == jnp.arange(M, dtype=jnp.float32)[None, None, :])
        m_t = jnp.sum(jnp.where(onehot, m[..., None, :], 0.0), axis=-1)
        dt = h * W / (K * jnp.maximum(m_t, 1e-8))
        # exploration samples land in tiny-mass bins -> huge IS weight;
        # clip to one interval width (their job is recovery gradients,
        # not unbiased empty-space integration).  Occupied bins have
        # m_t == 1 so the headline path is untouched by the clip.
        dt = jnp.where(m_t >= 1.0 - 1e-6, dt, jnp.minimum(dt, h))
        # fully-empty ray: W == 0 (or eps-floored pdf) -> uniform dt;
        # densities are masked downstream anyway
        dt = jnp.where(W > 1e-6, dt, (far - near) / K)
        return t, dt
    # "clip": dt to the next sample, clipped at the containing probe
    # interval's end
    interval_end = near + (interval + 1.0) * h
    t_next = jnp.concatenate(
        [t[..., 1:], jnp.broadcast_to(far, t[..., :1].shape)], axis=-1)
    dt = jnp.minimum(t_next, interval_end) - t
    return t, jnp.maximum(dt, 0.0)


def hierarchical_ts(key, t_coarse, weights, num_fine: int):
    """Merge coarse t values with importance-resampled fine t values.

    Capability parity with reference ``hierarchical_sampling``
    (helper.py:23-51): given coarse weights, draw ``num_fine`` new samples
    concentrated where weight mass is, concatenate with the coarse
    samples and sort (helper.py:47).  Weights of length S are reduced to
    the S-1 interior bins by taking the leading S-1 entries.

    Returns t of shape (..., S + num_fine), sorted ascending.
    """
    bins = t_coarse
    w = weights[..., : bins.shape[-1] - 1]
    t_fine = sample_pdf(key, bins, w, num_fine)
    t_all = jnp.concatenate([t_coarse, t_fine], axis=-1)
    return jnp.sort(t_all, axis=-1)
