"""End-to-end radiance-field forward passes (hash NeRF + classic NeRF).

The functional equivalent of reference ``Volume_Renderer.vol_render``
(vol_renderer.py:141-245): stratified sampling -> encode -> MLP ->
alpha compositing, with an optional hierarchical second pass and optional
SDF mode.  Everything is static-shaped and jit-friendly; occupancy
culling is a multiplicative density mask.

Model/scene state:
  params = {"table": (L,T,F), "mlp": {...}[, "var": {"b"}]}
  scene  = {"mu": (3,) or scalar, "sigma": scalar,
            "min_bound": (3,), "max_bound": (3,)}
(mu = min_bound, sigma = ||max-min||_2 in the trainer, matching
reference train_hash2.py:117-119.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.ops import compositing, occupancy, positional, sampling
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.utils.config import PipelineConfig


def encode_points(params, scene, pts, cfg: PipelineConfig, encode_key=None):
    """(N, 3) world points -> (N, L*F) hash features (variant-dispatched).

    ``encode_key`` activates the unbiased stochastic-corner estimator
    when ``cfg.hash.stochastic_train`` is set (training only).

    Level parallelism (``cfg.hash.level_axis`` set; only valid inside a
    shard_map over that axis — parallel/level_parallel.py): the table is
    the chip's LEVEL SLICE, ``params["lp_scales"]`` carries its matching
    resolutions, and the per-chip feature blocks are all_gathered along
    the level axis so the (replicated) MLP sees the full (N, L*F) vector.
    """
    stochastic = encode_key is not None and cfg.hash.stochastic_train
    enc = {k: params[k] for k in ("table", "dense", "lines")
           if k in params}
    return he.encode_params(enc, pts, scene["mu"], scene["sigma"],
                            cfg.hash, key=encode_key, stochastic=stochastic,
                            scales=params.get("lp_scales"))


def field_forward(params, scene, pts, dirs_enc, cfg: PipelineConfig,
                  compute_dtype=None, encode_key=None):
    """(rgb (N,3), density (N,)) at world points with encoded view dirs."""
    feats = encode_points(params, scene, pts, cfg, encode_key=encode_key)
    return mlp_lib.apply_mlp3d(params["mlp"], feats, dirs_enc, cfg.mlp,
                               compute_dtype=compute_dtype)


def density_only(params, scene, pts, cfg: PipelineConfig, compute_dtype=None):
    """Density branch only — used by occupancy updates and mesh export."""
    feats = encode_points(params, scene, pts, cfg)
    raw, _ = mlp_lib.mlp3d_density(params["mlp"], feats, cfg.mlp,
                                   compute_dtype=compute_dtype)
    return mlp_lib.apply_density_activation(raw, cfg.mlp)[..., 0]


def sdf_finite_difference_normals(params, scene, pts, cfg: PipelineConfig,
                                  eps: float = 5e-4, compute_dtype=None):
    """Central-difference gradient of the SDF head, batched over the six
    offsets in ONE forward pass (reference runs six sequential forwards,
    test_hash.py:86-105).  Points are clamped to the scene bounds as in
    the reference.  Needed because the hash encoder detaches its
    interpolation fractions, so analytic d(field)/dx is identically zero.
    """
    lo, hi = scene["min_bound"], scene["max_bound"]
    offs = jnp.concatenate([jnp.eye(3), -jnp.eye(3)]) * eps        # (6, 3)
    q = jnp.clip(pts[:, None, :] + offs[None, :, :], lo, hi)        # (N, 6, 3)
    d = density_only(params, scene, q.reshape(-1, 3), cfg,
                     compute_dtype=compute_dtype).reshape(-1, 6)
    return (d[:, :3] - d[:, 3:]) / (2.0 * eps)                      # (N, 3)


def _render_pass(params, scene, rays_o, rays_d, dir_norm, t,
                 cfg: PipelineConfig, occ: Optional[occupancy.OccupancyGrid],
                 compute_dtype, encode_key=None, allow_compact=True,
                 dt_override=None):
    """One encode->MLP->composite pass at the given t samples (B, S).

    With occupancy + ``compact_samples`` K > 0, each ray keeps only its
    first K occupied samples (depth order preserved) and the field runs
    on B*K points instead of B*S — the TPU-native replacement for the
    reference's ragged boolean-mask gather (vol_renderer.py:211-216)
    with static shapes throughout.
    """
    B, S = t.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]    # (B,S,3)
    dt_full = jnp.concatenate(
        [t[..., 1:] - t[..., :-1], jnp.zeros_like(t[..., :1])], axis=-1)

    K = cfg.render.compact_samples if allow_compact else 0
    mask = None
    dt = dt_override
    if occ is not None and (dt_override is None or not allow_compact):
        # Guided TRAINING placement (dt_override set, allow_compact on)
        # skips the mask lookup entirely: samples are already placed by
        # the grid, and masking them would zero the gradient of every
        # exploration sample in an empty-marked cell — wrongly-culled
        # cells could never recover (and the B*K lookups are
        # tile-priced, docs/PERF_NOTES.md).  Guided EVAL placement
        # (allow_compact off) has no gradients to protect, so the mask
        # IS applied there: it zeroes the density of the few
        # eps-floor samples that leak into empty space.
        mask = occupancy.lookup(occ, pts, scene["mu"], scene["sigma"])
        if dt_override is None and 0 < K < S and not cfg.render.use_sdf:
            # stable occupied-first order via top_k (cheaper than a full
            # argsort of S keys, scripts/tpu_profile_step.py); pts are
            # recomputed from the gathered t instead of gathering the
            # (B, S, 3) point tensor
            sort_key = ((1.0 - mask) * S
                        + jnp.arange(S, dtype=jnp.float32)[None, :])
            _, order = jax.lax.top_k(-sort_key, K)                  # (B, K)
            t = jnp.take_along_axis(t, order, axis=-1)
            dt = jnp.take_along_axis(dt_full, order, axis=-1)
            mask = jnp.take_along_axis(mask, order, axis=-1)
            pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
            S = K

    dirs_enc = positional.positional_encode(
        rays_d, cfg.dir_enc.num_freq, cfg.dir_enc.mode)             # (B, dv)
    dirs_rep = jnp.broadcast_to(dirs_enc[:, None, :],
                                (B, S, dirs_enc.shape[-1]))
    rgb, density = field_forward(
        params, scene, pts.reshape(B * S, 3),
        dirs_rep.reshape(B * S, -1), cfg, compute_dtype=compute_dtype,
        encode_key=encode_key)
    rgb = rgb.reshape(B, S, 3)
    density = density.reshape(B, S)
    if mask is not None:
        density = density * mask
    if cfg.render.use_sdf:
        color, weights, trans = compositing.composite_sdf(
            t, rgb, density, params["var"]["b"], dir_norm)
        return color, weights, density, pts, t
    else:
        color, weights, trans = compositing.composite(
            t, rgb, density, dir_norm,
            sigma_clip_min=cfg.render.sigma_clip_min,
            white_background=cfg.render.white_background, dt=dt)
    return color, weights, density, pts, t


def render_rays(params, scene, rays_o, rays_d, dir_norm, key,
                cfg: PipelineConfig, *, num_samples: Optional[int] = None,
                hierarchical: Optional[bool] = None,
                occ: Optional[occupancy.OccupancyGrid] = None,
                jitter: bool = True, compute_dtype=None):
    """Render a ray batch.  Returns a dict with coarse/fine colours.

    Equivalent capability to reference ``vol_render``
    (vol_renderer.py:141-245) returning (Cr, Cf, norm); here:
      out["coarse"], out["fine"] (== coarse when not hierarchical),
      out["eikonal_norm"] (SDF mode only), plus weights for diagnostics.
    """
    S = cfg.render.num_samples if num_samples is None else num_samples
    hier = cfg.render.hierarchical if hierarchical is None else hierarchical
    k_strat, k_fine, k_enc, k_enc2 = jax.random.split(key, 4)
    B = rays_o.shape[0]
    # stochastic encoding only while training (jitter on) and if enabled
    enc_key = (k_enc if (jitter and cfg.hash.stochastic_train) else None)
    dt_guided = None
    guided_train = cfg.render.occ_guided and occ is not None and jitter
    guided_eval = (cfg.render.eval_guided > 0 and occ is not None
                   and not jitter)
    if guided_train or guided_eval:
        # occupancy-guided inverse-CDF placement: S probe intervals, a
        # compact_samples (or S) sample budget spread over the occupied
        # span — no truncation risk, samples only where matter lives.
        # Eval variant (serving): deterministic stratified quantiles of
        # the occupied CDF, exploration off (no gradients to protect),
        # budget = cfg.render.eval_guided.
        K_s = (cfg.render.compact_samples or S) if guided_train \
            else cfg.render.eval_guided
        t, dt_guided = sampling.occupancy_guided_ts(
            k_strat, rays_o, rays_d, occ, scene["mu"], scene["sigma"],
            cfg.render.near, cfg.render.far, K_s,
            num_probe=cfg.render.occ_probes or S,
            explore_frac=cfg.render.occ_explore if guided_train else 0.0,
            jitter=jitter,
            probe_jitter=cfg.render.occ_probe_jitter and jitter,
            dt_mode=cfg.render.occ_dt,
            stratified=cfg.render.occ_stratified and jitter)
        # Placement depends on (rays, occ grid) only — never on params —
        # so cut it out of the differentiated graph explicitly
        # (semantically a no-op; keeps the grad trace from ever touching
        # the placement subgraph).
        t = jax.lax.stop_gradient(t)
        dt_guided = jax.lax.stop_gradient(dt_guided)
    else:
        t = sampling.stratified_ts(
            k_strat, (B,), cfg.render.near, cfg.render.far, S,
            per_ray_jitter=cfg.render.per_ray_jitter,
            log_sampling=cfg.render.log_sampling, jitter=jitter)

    # compaction truncates rays to a fixed occupied-sample budget sized
    # for the training sample count; eval renders (jitter off, often many
    # more samples) use the plain masked path
    coarse, weights, density, pts, t_eff = _render_pass(
        params, scene, rays_o, rays_d, dir_norm, t, cfg, occ, compute_dtype,
        encode_key=enc_key, allow_compact=jitter, dt_override=dt_guided)

    out = {"coarse": coarse, "weights": weights, "t": t_eff,
           "density": density}

    if hier:
        n_fine = cfg.render.num_fine_samples or S
        t_h, w_h = t_eff, jax.lax.stop_gradient(weights)
        if occ is not None and jitter and 0 < cfg.render.compact_samples:
            # compaction emits occupied-first order; rays with fewer
            # occupied samples than the budget get an unoccupied tail
            # that restarts at earlier depths — re-sort so sample_pdf's
            # sorted-bins assumption holds (weights permuted to match)
            order = jnp.argsort(t_h, axis=-1)
            t_h = jnp.take_along_axis(t_h, order, axis=-1)
            w_h = jnp.take_along_axis(w_h, order, axis=-1)
        t_fine = sampling.hierarchical_ts(k_fine, t_h, w_h, n_fine)
        fine, fweights, fdensity, fpts, _ = _render_pass(
            params, scene, rays_o, rays_d, dir_norm, t_fine, cfg, occ,
            compute_dtype,
            encode_key=(k_enc2 if enc_key is not None else None),
            allow_compact=jitter)
        out["fine"] = fine
        out["fine_weights"] = fweights
        sdf_pts = fpts
    else:
        out["fine"] = coarse
        sdf_pts = pts

    if cfg.render.use_sdf:
        mid = sdf_pts.reshape(-1, 3)
        # Subsampled eikonal (cfg.train.eikonal_subsample > 0): the
        # regulariser's 6 finite-difference encoder evals run on a
        # random point subset instead of all B*S points (training
        # only; with-replacement randint — one tiny gather).  0 keeps
        # the reference all-points semantics (helper.py:293-297).
        n_sub = cfg.train.eikonal_subsample
        if jitter and 0 < n_sub < mid.shape[0]:
            k_eik = jax.random.fold_in(key, 0x5DF)
            idx = jax.random.randint(k_eik, (n_sub,), 0, mid.shape[0])
            mid = jnp.take(mid, idx, axis=0)
        grads = sdf_finite_difference_normals(params, scene, mid, cfg,
                                              compute_dtype=compute_dtype)
        out["eikonal_norm"] = jnp.sqrt(
            jnp.sum(grads ** 2, axis=-1) + 1e-12)   # helper.py:293-297
    return out


def eikonal_loss(norm):
    """mean((|grad| - 1)^2) (reference helper.py:298-299)."""
    return jnp.mean((norm - 1.0) ** 2)
