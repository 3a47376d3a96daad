"""Occupancy-driven sample compaction: compacted render must match the
full render when the occupancy grid is consistent with the field."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.data import synthetic
from human_body_reconstruction_tpu.models import nerf
from human_body_reconstruction_tpu.ops import occupancy
from human_body_reconstruction_tpu.train import state as state_lib
from human_body_reconstruction_tpu.train import step as step_lib
from human_body_reconstruction_tpu.train import trainer as trainer_lib
from human_body_reconstruction_tpu.utils import config as C


def make_cfg(compact=0, occupancy_on=True):
    return C.PipelineConfig(
        hash=C.HashConfig(num_levels=6, log2_table_size=12, n_min=4,
                          n_max=128),
        render=C.RenderConfig(num_samples=64, occupancy=occupancy_on,
                              occupancy_resolution=32,
                              compact_samples=compact),
        train=C.TrainConfig(ray_batch=512),
    )


def trained_setup(steps=200):
    cfg = make_cfg()
    ds = synthetic.make_dataset(n_views=5, H=32, W=32)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, steps)
    for _ in range(steps):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 512)
    return cfg, ds, scene, state


def test_compacted_render_matches_full():
    cfg, ds, scene, state = trained_setup()

    # build a *converged* occupancy grid from the trained density
    occ = occupancy.init_grid(32, threshold=0.05)
    def density_fn(pts):
        return nerf.density_only(state.params, scene, pts, cfg)
    for k in range(12):
        occ = occupancy.update(occ, density_fn, jax.random.PRNGKey(k),
                               scene["mu"], scene["sigma"],
                               num_cells=32 ** 3)
    frac = float(occupancy.occupied_fraction(occ))
    assert frac < 0.9, f"grid did not cull anything ({frac})"

    key = jax.random.PRNGKey(7)
    o, d, n = step_lib.sample_ray_batch(key, ds["images"], ds["c2ws"],
                                        ds["K"], 256)[:3]

    # jitter=True: the training path, where compaction applies; same key
    # -> identical stratified t for both renders
    full = nerf.render_rays(state.params, scene, o, d, n, key, cfg,
                            occ=occ, jitter=True)["fine"]

    K = 48
    cfg_c = make_cfg(compact=K)
    compacted = nerf.render_rays(state.params, scene, o, d, n, key, cfg_c,
                                 occ=occ, jitter=True)["fine"]

    # rays whose occupied-sample count fits the K budget must match
    # the full render EXACTLY (compaction only drops empty intervals);
    # overflowing rays may differ (their deepest samples are dropped).
    from human_body_reconstruction_tpu.ops import sampling

    k_strat = jax.random.split(key, 4)[0]   # matches render_rays' split
    t = sampling.stratified_ts(k_strat, (256,), cfg.render.near,
                               cfg.render.far, cfg.render.num_samples,
                               per_ray_jitter=cfg.render.per_ray_jitter,
                               jitter=True)
    pts = o[:, None, :] + d[:, None, :] * t[..., None]
    occ_count = np.asarray(occupancy.lookup(occ, pts, scene["mu"],
                                            scene["sigma"]).sum(-1))
    fits = occ_count <= K
    assert fits.mean() > 0.5, "test scene too dense to exercise compaction"
    diff = np.abs(np.asarray(full) - np.asarray(compacted)).max(axis=-1)
    assert diff[fits].max() < 1e-4, diff[fits].max()


def test_compaction_training_runs():
    cfg = make_cfg(compact=16)
    ds = synthetic.make_dataset(n_views=3, H=24, W=24)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    occ = occupancy.init_grid(32)
    state, tx = state_lib.create_train_state(params, cfg.train, 30,
                                             occ=occ)
    for _ in range(30):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 256)
    assert np.isfinite(float(m["loss"]))


def test_compaction_disabled_at_eval():
    """Eval renders (jitter=False) must ignore the compaction budget —
    a K sized for 64 training samples would truncate dense 256-sample
    eval rays (regression test for the train/eval PSNR gap)."""
    cfg, ds, scene, state = trained_setup(steps=50)
    occ = occupancy.init_grid(32, threshold=0.05)
    key = jax.random.PRNGKey(3)
    o, d, n = step_lib.sample_ray_batch(key, ds["images"], ds["c2ws"],
                                        ds["K"], 64)[:3]
    cfg_c = make_cfg(compact=8)  # absurdly small budget
    with_c = nerf.render_rays(state.params, scene, o, d, n, key, cfg_c,
                              occ=occ, jitter=False)["fine"]
    without = nerf.render_rays(state.params, scene, o, d, n, key,
                               make_cfg(compact=0), occ=occ,
                               jitter=False)["fine"]
    np.testing.assert_allclose(np.asarray(with_c), np.asarray(without),
                               atol=1e-6)


def test_update_from_field_matches_closure_update():
    """The jitted one-dispatch refresh (occupancy.update_from_field)
    matches the eager closure form it replaces (same key, same cell
    draw, same density field) up to fusion-order float error."""
    cfg, ds, scene, state = trained_setup(steps=30)
    occ = occupancy.init_grid(32, threshold=0.05)
    key = jax.random.PRNGKey(11)

    eager = occupancy.update(
        occ, lambda p: nerf.density_only(state.params, scene, p, cfg),
        key, scene["mu"], scene["sigma"], num_cells=4096)
    jitted = occupancy.update_from_field(occ, state.params, scene, key,
                                         cfg, num_cells=4096)
    np.testing.assert_allclose(np.asarray(eager.density),
                               np.asarray(jitted.density),
                               rtol=1e-4, atol=1e-5)
    # masks may flip only where the density sits within float error of
    # the threshold
    disagree = np.asarray(eager.mask) != np.asarray(jitted.mask)
    near = np.abs(np.asarray(eager.density) - occ.threshold) < 1e-4
    assert not np.any(disagree & ~near)
