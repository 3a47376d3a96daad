"""End-to-end integration: overfit the hash-NeRF on a synthetic volume.

The golden-image substitute for the reference's visual smoke tests
(SURVEY.md section 4): training must materially improve PSNR on images of
a known analytic emissive volume rendered with the same compositing math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.data import synthetic
from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.train import state as state_lib
from human_body_reconstruction_tpu.train import step as step_lib
from human_body_reconstruction_tpu.utils import config as cfg_lib


def small_cfg(**render_kw):
    return cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=8, log2_table_size=12, n_min=4,
                                n_max=128),
        dir_enc=cfg_lib.PosEncConfig(num_freq=4),
        mlp=cfg_lib.MLPConfig(),
        render=cfg_lib.RenderConfig(near=2.0, far=6.0, num_samples=32,
                                    **render_kw),
        train=cfg_lib.TrainConfig(ray_batch=1024),
    )


def build(cfg, key=jax.random.PRNGKey(0), use_sdf=False):
    k1, k2 = jax.random.split(key)
    params = {
        "table": he.init_table(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    if use_sdf:
        params["var"] = mlp_lib.init_var_model()
    return params


def make_scene(ds):
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    return {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
            "min_bound": lo, "max_bound": hi}


@pytest.fixture(scope="module")
def dataset():
    return synthetic.make_dataset(n_views=6, H=40, W=40)


def run_training(dataset, cfg, steps=250, seed=0):
    params = build(cfg)
    scene = make_scene(dataset)
    state, tx = state_lib.create_train_state(params, cfg.train, steps)
    key = jax.random.PRNGKey(seed)
    metrics = None
    for _ in range(steps):
        state, metrics = step_lib.train_step(
            state, scene, dataset["images"], dataset["c2ws"], dataset["K"],
            key, cfg, tx, cfg.train.ray_batch)
    return state, scene, metrics


def test_overfit_blob_scene(dataset):
    cfg = small_cfg()
    state, scene, metrics = run_training(dataset, cfg, steps=300)
    final_psnr = float(metrics["psnr"])
    assert final_psnr > 22.0, f"train PSNR too low: {final_psnr}"

    # held-out-style full-image render against GT (same pose set)
    img = step_lib.render_image(state.params, scene, dataset["H"],
                                dataset["W"], dataset["K"],
                                dataset["c2ws"][0], cfg, num_samples=64)
    gt = np.asarray(dataset["images"][0])
    mse = np.mean((img - gt) ** 2)
    psnr = 10 * np.log10(1.0 / mse)
    assert psnr > 20.0, f"render PSNR too low: {psnr}"


def test_training_reduces_loss(dataset):
    cfg = small_cfg()
    params = build(cfg)
    scene = make_scene(dataset)
    state, tx = state_lib.create_train_state(params, cfg.train, 100)
    key = jax.random.PRNGKey(1)
    first = None
    last = None
    for _ in range(100):
        state, m = step_lib.train_step(
            state, scene, dataset["images"], dataset["c2ws"], dataset["K"],
            key, cfg, tx, 512)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first * 0.5, (first, last)


def test_hierarchical_training_runs(dataset):
    cfg = small_cfg(hierarchical=True, num_fine_samples=32)
    state, scene, metrics = run_training(dataset, cfg, steps=30)
    assert np.isfinite(float(metrics["loss"]))


def test_sdf_mode_runs_and_has_eikonal(dataset):
    cfg = small_cfg(use_sdf=True)
    cfg = cfg_lib.PipelineConfig(
        hash=cfg.hash, dir_enc=cfg.dir_enc,
        mlp=cfg_lib.MLPConfig(density_activation="sdf"),
        render=cfg.render, train=cfg.train)
    params = build(cfg, use_sdf=True)
    scene = make_scene(dataset)
    state, tx = state_lib.create_train_state(params, cfg.train, 20)
    key = jax.random.PRNGKey(2)
    for _ in range(10):
        state, m = step_lib.train_step(
            state, scene, dataset["images"], dataset["c2ws"], dataset["K"],
            key, cfg, tx, 256)
    assert "eikonal" in m and np.isfinite(float(m["eikonal"]))
    # var sharpness got optimizer updates
    assert float(state.params["var"]["b"]) != 0.5


def test_sdf_eikonal_subsample(dataset):
    """eikonal_subsample > 0 computes the eikonal residual on a random
    point subset during TRAINING only (the full-points SDF HLO is ~100x
    larger — it is the one module that crashes the TPU remote compile
    helper, qm_r4_sdf3.json); eval renders and subsample=0 keep the
    reference all-points semantics (helper.py:293-297)."""
    import dataclasses

    from human_body_reconstruction_tpu.models import nerf

    cfg = small_cfg(use_sdf=True)
    cfg = cfg_lib.PipelineConfig(
        hash=cfg.hash, dir_enc=cfg.dir_enc,
        mlp=cfg_lib.MLPConfig(density_activation="sdf"),
        render=cfg.render,
        train=dataclasses.replace(cfg.train, eikonal_subsample=64))
    params = build(cfg, use_sdf=True)
    scene = make_scene(dataset)
    B, S = 128, cfg.render.num_samples
    o = jnp.zeros((B, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    nrm = jnp.ones((B,))
    out = nerf.render_rays(params, scene, o, d, nrm,
                           jax.random.PRNGKey(1), cfg, jitter=True)
    assert out["eikonal_norm"].shape == (64,)
    out_eval = nerf.render_rays(params, scene, o, d, nrm,
                                jax.random.PRNGKey(1), cfg, jitter=False)
    assert out_eval["eikonal_norm"].shape == (B * S,)
    # and the training step composes end-to-end with the subsample
    state, tx = state_lib.create_train_state(params, cfg.train, 20)
    for _ in range(5):
        state, m = step_lib.train_step(
            state, scene, dataset["images"], dataset["c2ws"], dataset["K"],
            jax.random.PRNGKey(2), cfg, tx, 256)
    assert np.isfinite(float(m["eikonal"]))


def test_unit_box_normalization_trains(dataset):
    cfg = small_cfg()
    cfg = cfg_lib.PipelineConfig(
        hash=cfg.hash, dir_enc=cfg.dir_enc, mlp=cfg.mlp,
        render=cfg_lib.RenderConfig(near=2.0, far=6.0, num_samples=32,
                                    normalization="unit_box"),
        train=cfg.train)
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    scene = trainer_lib.scene_from_dataset(dataset, cfg)
    assert scene["sigma"].shape == (3,)
    params = build(cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, 150)
    for _ in range(150):
        state, m = step_lib.train_step(
            state, scene, dataset["images"], dataset["c2ws"], dataset["K"],
            jax.random.PRNGKey(0), cfg, tx, 1024)
    assert float(m["psnr"]) > 20.0, float(m["psnr"])


def test_training_is_deterministic(dataset):
    """Same seed -> bit-identical parameters after N steps."""
    cfg = small_cfg()

    def run():
        params = build(cfg)
        scene = make_scene(dataset)
        state, tx = state_lib.create_train_state(params, cfg.train, 20)
        for _ in range(20):
            state, _ = step_lib.train_step(
                state, scene, dataset["images"], dataset["c2ws"],
                dataset["K"], jax.random.PRNGKey(9), cfg, tx, 512)
        return np.asarray(state.params["table"])

    np.testing.assert_array_equal(run(), run())


def test_multi_step_scan_matches_sequential(dataset):
    """train_step_multi(n) == n sequential train_step calls, bit-exact:
    the fused dispatch must not change training semantics (the per-step
    key fold uses state.step inside the scan body too)."""
    cfg = small_cfg()
    scene = make_scene(dataset)
    key = jax.random.PRNGKey(3)

    def init():
        state, tx = state_lib.create_train_state(build(cfg), cfg.train, 12)
        return state, tx

    state_a, tx = init()
    for _ in range(12):
        state_a, m_a = step_lib.train_step(
            state_a, scene, dataset["images"], dataset["c2ws"],
            dataset["K"], key, cfg, tx, 512)

    state_b, tx_b = init()
    metrics = []
    for _ in range(3):
        state_b, m_b = step_lib.train_step_multi(
            state_b, scene, dataset["images"], dataset["c2ws"],
            dataset["K"], key, cfg, tx_b, 512, 4)
        metrics.append(m_b)

    assert int(state_b.step) == int(state_a.step) == 12
    np.testing.assert_array_equal(np.asarray(state_a.params["table"]),
                                  np.asarray(state_b.params["table"]))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        state_a.params["mlp"], state_b.params["mlp"])
    assert np.isfinite(float(m_b["loss"]))


def test_trainer_steps_per_call(tmp_path, dataset):
    """Trainer with steps_per_call>1: occupancy warmup installs, cadences
    fire on crossings, final step count is exact, training converges."""
    from human_body_reconstruction_tpu.train.trainer import Trainer

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=6, log2_table_size=12, n_min=4,
                                n_max=128),
        render=cfg_lib.RenderConfig(num_samples=32, occupancy=True,
                                    occupancy_resolution=32,
                                    compact_samples=16),
        train=cfg_lib.TrainConfig(ray_batch=1024, update_rate=25,
                                  occ_warmup_steps=30))
    tr = Trainer(cfg=cfg, ds=dataset, out_dir=str(tmp_path), model_name="s",
                 log_fn=lambda s: None, steps_per_call=8)
    tr.run(100, log_every=0)          # 100 % 8 != 0: remainder chunk too
    assert int(tr.state.step) == 100
    assert tr.state.occ is not None   # warmup install crossed mid-run
    psnr = tr.eval_render(0, num_samples=64, write_png=False)
    assert np.isfinite(psnr) and psnr > 18.0, psnr


def test_trainer_warmup_guided_explore_composition(tmp_path):
    """Trainer path with occupancy warmup + guided placement +
    exploration all composed: culling engages mid-run, training stays
    finite and converges, eval render is sane."""
    from human_body_reconstruction_tpu.train.trainer import Trainer

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=6, log2_table_size=12, n_min=4,
                                n_max=128, stochastic_train=True,
                                packed=True),
        render=cfg_lib.RenderConfig(num_samples=32, occupancy=True,
                                    occupancy_resolution=32,
                                    compact_samples=16, occ_guided=True,
                                    occ_probes=16, occ_explore=0.05),
        train=cfg_lib.TrainConfig(ray_batch=1024, update_rate=25,
                                  occ_warmup_steps=60))
    ds = synthetic.make_dataset(n_views=6, H=40, W=40)
    tr = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path), model_name="g",
                 log_fn=lambda s: None)
    assert tr.state.occ is None
    tr.run(150, log_every=0)
    assert tr.state.occ is not None
    psnr = tr.eval_render(0, num_samples=64, write_png=False)
    assert np.isfinite(psnr) and psnr > 20.0, psnr
    # guided EVAL placement (serving mode): deterministic stratified
    # quantiles of the trained occupancy CDF at a small budget must
    # render close to the exact ladder (cli/train_hash --eval_guided)
    import dataclasses

    tr.cfg = dataclasses.replace(
        tr.cfg, render=dataclasses.replace(tr.cfg.render, eval_guided=12))
    psnr_g = tr.eval_render(0, num_samples=64, write_png=False)
    assert np.isfinite(psnr_g) and psnr_g > psnr - 4.0, (psnr, psnr_g)


def test_sdf_mode_converges_on_sphere():
    """SDF-mode CONVERGENCE (round-2, VERDICT weak #5): training the
    NeuS-style branch on a solid-sphere scene must (a) reach a real
    PSNR, (b) drive the eikonal residual down, and (c) place the
    rendered surface (weight centroid along central rays) at the sphere
    boundary — capability-tested, not just compile-tested."""
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.ops import rays as rays_lib

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=8, log2_table_size=12, n_min=4,
                                n_max=128),
        mlp=cfg_lib.MLPConfig(density_activation="sdf"),
        render=cfg_lib.RenderConfig(near=2.0, far=6.0, num_samples=32,
                                    use_sdf=True),
        train=cfg_lib.TrainConfig(ray_batch=512))
    ds = synthetic.make_dataset(n_views=6, H=40, W=40,
                                field=synthetic.sphere_field)
    scene = make_scene(ds)
    params = build(cfg, use_sdf=True)
    state, tx = state_lib.create_train_state(params, cfg.train, 400)
    eik_first = None
    for i in range(400):
        state, m = step_lib.train_step(
            state, scene, ds["images"], ds["c2ws"], ds["K"],
            jax.random.PRNGKey(3), cfg, tx, 512)
        if eik_first is None:
            eik_first = float(m["eikonal"])
    assert float(m["psnr"]) > 25.0, float(m["psnr"])
    assert float(m["eikonal"]) < 0.5 * eik_first

    # surface recovery: weight centroid of central rays ~= camera
    # distance (4.0) - sphere radius (0.6), modulo the soft boundary
    o, d, n = rays_lib.full_image_rays(ds["H"], ds["W"], ds["K"],
                                       ds["c2ws"][0])
    cidx = (ds["H"] // 2) * ds["W"] + ds["W"] // 2
    sel = jnp.asarray([cidx, cidx - 1, cidx + 1])
    out = nerf.render_rays(state.params, scene, o[sel], d[sel], n[sel],
                           jax.random.PRNGKey(0), cfg, num_samples=128,
                           jitter=False)
    w = np.asarray(out["weights"])
    t = np.asarray(out["t"])
    depth = (t * w).sum(-1) / (w.sum(-1) + 1e-9)
    assert (w.sum(-1) > 0.5).all(), w.sum(-1)
    assert ((depth > 3.0) & (depth < 3.6)).all(), depth
