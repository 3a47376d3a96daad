"""Dataset readers, checkpoint round-trips, trainer harness, CLI."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.data import datasets, synthetic
from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib
from human_body_reconstruction_tpu.utils import config as cfg_lib


def _write_fake_blender(tmp_path, n=3, H=16, W=20):
    from PIL import Image

    d = tmp_path / "train"
    d.mkdir()
    frames = []
    rng = np.random.RandomState(0)
    for k in range(n):
        img = (rng.rand(H, W, 4) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(d / f"r_{k}.png")
        frames.append({"file_path": f"./train/r_{k}",
                       "transform_matrix": np.eye(4).tolist(),
                       "rotation": 0.1 * k})
    meta = {"camera_angle_x": 0.6911, "frames": frames}
    p = tmp_path / "transforms_train.json"
    p.write_text(json.dumps(meta))
    return str(p), H, W


def test_load_blender_format(tmp_path):
    p, H, W = _write_fake_blender(tmp_path)
    ds = datasets.load_nerf_json(p)
    assert ds["images"].shape == (3, H, W, 3)
    assert ds["c2ws"].shape == (3, 4, 4)
    focal = W / (2 * np.tan(0.6911 / 2))
    np.testing.assert_allclose(ds["K"][0, 0], focal, rtol=1e-5)
    np.testing.assert_allclose(ds["K"][0, 2], W / 2)
    assert ds["images"].dtype == np.float32
    assert ds["images"].max() <= 1.0


def test_load_ingp_format(tmp_path):
    from PIL import Image

    d = tmp_path / "images"
    d.mkdir()
    Image.fromarray(np.zeros((8, 10, 3), np.uint8)).save(d / "0001.jpg")
    meta = {"camera_angle_x": 0.7, "fl_x": 100.0, "fl_y": 101.0,
            "cx": 5.0, "cy": 4.0, "w": 10, "h": 8,
            "frames": [{"file_path": "./images/0001.jpg",
                        "transform_matrix": np.eye(4).tolist(),
                        "sharpness": 12.5}]}
    p = tmp_path / "transforms.json"
    p.write_text(json.dumps(meta))
    ds = datasets.load_nerf_json(str(p))
    assert ds["images"].shape == (1, 8, 10, 3)
    np.testing.assert_allclose(ds["K"][0, 0], 100.0)
    np.testing.assert_allclose(ds["aux"], [12.5])


def test_white_background_compositing(tmp_path):
    from PIL import Image

    d = tmp_path / "train"
    d.mkdir()
    rgba = np.zeros((4, 4, 4), np.uint8)  # fully transparent black
    Image.fromarray(rgba, "RGBA").save(d / "r_0.png")
    meta = {"camera_angle_x": 0.7,
            "frames": [{"file_path": "./train/r_0",
                        "transform_matrix": np.eye(4).tolist()}]}
    p = tmp_path / "t.json"
    p.write_text(json.dumps(meta))
    ds = datasets.load_nerf_json(str(p), white_background=True)
    np.testing.assert_allclose(ds["images"], 1.0)
    ds = datasets.load_nerf_json(str(p), white_background=False)
    np.testing.assert_allclose(ds["images"], 0.0)


def test_bounds_roundtrip_and_name_mismatch(tmp_path):
    lo = np.asarray([-1.0, -2.0, -3.0], np.float32)
    hi = np.asarray([1.0, 2.0, 3.0], np.float32)
    p = str(tmp_path / "bounds_model.npy")
    ckpt_lib.save_bounds(p, lo, hi)
    # load via the OTHER spelling (reference's mismatch)
    lo2, hi2 = ckpt_lib.load_bounds(str(tmp_path / "bounds.npy"))
    np.testing.assert_allclose(lo2, lo)
    np.testing.assert_allclose(hi2, hi)


def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": [jnp.zeros(4), {"c": jnp.ones((2, 2))}]}
    p = str(tmp_path / "ck.npz")
    ckpt_lib.save_pytree(p, tree, extra={"step": 7})
    loaded, extra = ckpt_lib.load_pytree(p, tree, extra_keys=("step",))
    np.testing.assert_allclose(loaded["a"], np.arange(6).reshape(2, 3))
    assert int(extra["step"]) == 7


def test_checkpoint_shape_mismatch_raises(tmp_path):
    tree = {"a": jnp.zeros((2, 3))}
    p = str(tmp_path / "ck.npz")
    ckpt_lib.save_pytree(p, tree)
    with pytest.raises(ValueError):
        ckpt_lib.load_pytree(p, {"a": jnp.zeros((3, 3))})


def test_trainer_harness_and_resume(tmp_path):
    from human_body_reconstruction_tpu.train.trainer import Trainer

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=4, log2_table_size=10, n_min=4,
                                n_max=64),
        render=cfg_lib.RenderConfig(num_samples=16),
        train=cfg_lib.TrainConfig(ray_batch=256),
    )
    ds = synthetic.make_dataset(n_views=3, H=24, W=24)
    tr = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path), model_name="t",
                 log_fn=lambda s: None)
    tr.run(20, log_every=10)
    tr.save()
    assert os.path.exists(tr.ckpt_path())
    # bounds artifact written at init with the reference layout
    b = np.load(os.path.join(str(tmp_path), "bounds_model.npy"))
    assert b.shape == (2, 3)

    tr2 = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path), model_name="t",
                  log_fn=lambda s: None)
    tr2.load()
    assert int(tr2.state.step) == 20
    np.testing.assert_allclose(np.asarray(tr2.state.params["table"]),
                               np.asarray(tr.state.params["table"]))
    psnr = tr2.eval_render(num_samples=16, write_png=True, tag="test")
    assert np.isfinite(psnr)
    assert os.path.exists(os.path.join(str(tmp_path), "t_test.png"))


def test_trainer_occupancy_updates(tmp_path):
    from human_body_reconstruction_tpu.train.trainer import Trainer

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=4, log2_table_size=10, n_min=4,
                                n_max=64),
        render=cfg_lib.RenderConfig(num_samples=16, occupancy=True,
                                    occupancy_resolution=32),
        train=cfg_lib.TrainConfig(ray_batch=256, update_rate=5,
                                  occ_warmup_steps=0),
    )
    ds = synthetic.make_dataset(n_views=3, H=24, W=24)
    tr = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path), model_name="o",
                 log_fn=lambda s: None)
    assert tr.state.occ is not None
    tr.run(12, log_every=0)
    from human_body_reconstruction_tpu.ops import occupancy
    frac = float(occupancy.occupied_fraction(tr.state.occ))
    assert 0.0 < frac <= 1.0
    # after updates on an untrained-ish model some cells must have real
    # (non-inf) density estimates
    assert np.isfinite(np.asarray(tr.state.occ.density)).any()


def test_trainer_occupancy_warmup(tmp_path):
    """Culling must NOT engage before occ_warmup_steps (the grid would
    lock in decisions from a near-random field) and must engage right
    after, including across a checkpoint resume."""
    from human_body_reconstruction_tpu.train.trainer import Trainer

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=4, log2_table_size=10, n_min=4,
                                n_max=64),
        render=cfg_lib.RenderConfig(num_samples=16, occupancy=True,
                                    occupancy_resolution=32),
        train=cfg_lib.TrainConfig(ray_batch=256, update_rate=5,
                                  occ_warmup_steps=8),
    )
    ds = synthetic.make_dataset(n_views=3, H=24, W=24)
    tr = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path), model_name="w",
                 log_fn=lambda s: None)
    assert tr.state.occ is None and tr._occ_pending is not None
    tr.run(5, log_every=0)
    assert tr.state.occ is None          # still warming up
    tr.run(6, log_every=0)
    assert tr.state.occ is not None      # engaged at step 8
    tr.save()

    tr2 = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path), model_name="w",
                  log_fn=lambda s: None)
    assert tr2.state.occ is None
    tr2.load()
    assert tr2.state.occ is not None     # grid restored despite warmup
    assert tr2._occ_pending is None

    # resuming the same checkpoint with occupancy DISABLED must NOT
    # attach the saved grid (it would cull through a frozen stale mask
    # that nothing updates)
    import dataclasses
    cfg_off = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, occupancy=False))
    tr3 = Trainer(cfg=cfg_off, ds=ds, out_dir=str(tmp_path),
                  model_name="w", log_fn=lambda s: None)
    tr3.load()
    assert tr3.state.occ is None


def test_cli_synthetic_smoke(tmp_path):
    from human_body_reconstruction_tpu.cli import train_hash

    out = str(tmp_path / "run")
    train_hash.main([
        "--synthetic", "--steps", "12", "--num_batch", "256",
        "--num_samples", "8", "--hash_size", "10", "--max_res", "64",
        "--out_dir", out, "--log_every", "6", "--model_name", "smoke"])
    assert os.path.exists(os.path.join(out, "smoke_ckpt.npz"))
    assert os.path.exists(os.path.join(out, "bounds_model.npy"))


def test_cli_flag_surface_matches_reference():
    """Every reference train_hash2.py flag parses."""
    from human_body_reconstruction_tpu.cli import train_hash

    p = train_hash.build_parser()
    args = p.parse_args([
        "--display", "--compile", "--load", "--update_rate", "10",
        "--write", "--num_epochs", "5", "--num_batch", "1000",
        "--num_imgs", "3", "--num_samples", "32", "--near", "1.5",
        "--far", "7.0", "--plot_grads", "--use_sdf", "--hierarchical",
        "--max_res", "1024", "--hash_size", "14", "--model_name", "m",
        "--data_path", "/tmp/x", "--ckpt_name", "c"])
    assert args.num_batch == 1000 and args.hash_size == 14
    assert args.use_sdf and args.hierarchical


def test_onecycle_schedule_option():
    import optax
    from human_body_reconstruction_tpu.train import state as state_lib

    cfg = cfg_lib.TrainConfig(schedule="onecycle", lr_hash=0.05)
    params = {"table": jnp.zeros((2, 4, 2)),
              "mlp": {"w": jnp.zeros((3, 3))}}
    tx = state_lib.make_optimizer(cfg, 100, params)
    opt_state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(g, opt_state, params)
    assert np.isfinite(np.asarray(updates["table"])).all()
    # schedule shape: warms up then anneals
    sched = state_lib._make_schedule(cfg, 0.05, 100)
    assert float(sched(0)) < float(sched(30))
    assert float(sched(99)) < float(sched(30))


def test_dataset_downscale_and_max_frames(tmp_path):
    p, H, W = _write_fake_blender(tmp_path, n=3, H=16, W=20)
    ds = datasets.load_nerf_json(p, downscale=2, max_frames=2)
    assert ds["images"].shape == (2, 8, 10, 3)
    # intrinsics follow the blender branch recomputed at new size
    focal = 10 / (2 * np.tan(0.6911 / 2))
    np.testing.assert_allclose(ds["K"][0, 0], focal, rtol=1e-5)


def test_debug_check_toggles():
    import jax

    from human_body_reconstruction_tpu.utils import observability as obs

    obs.enable_debug_checks(nans=True)
    assert jax.config.jax_debug_nans
    obs.enable_debug_checks(nans=False)
    assert not jax.config.jax_debug_nans


def test_profile_trace_writes(tmp_path):
    import jax.numpy as jnp

    from human_body_reconstruction_tpu.utils import observability as obs

    d = str(tmp_path / "trace")
    with obs.profile_trace(d):
        jnp.ones(16).sum().block_until_ready()
    assert os.path.exists(d) and len(os.listdir(d)) > 0
