"""Sample-axis parallel rendering: exactness vs the single-device path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.data import synthetic
from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.models import nerf
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.ops import occupancy
from human_body_reconstruction_tpu.ops import rays as rays_lib
from human_body_reconstruction_tpu.parallel import sample_parallel as sp
from human_body_reconstruction_tpu.utils import config as C


@pytest.fixture(scope="module")
def setup():
    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=4, log2_table_size=12, n_min=4,
                          n_max=64),
        render=C.RenderConfig(num_samples=32))
    ds = synthetic.make_dataset(n_views=2, H=16, W=16)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    o, d, n = rays_lib.full_image_rays(ds["H"], ds["W"], ds["K"],
                                       ds["c2ws"][0])
    return cfg, scene, params, (o, d, n)


def _reference_render(cfg, scene, params, rays, num_samples, occ=None):
    o, d, n = rays
    out = nerf.render_rays(params, scene, o, d, n, jax.random.PRNGKey(0),
                           cfg, num_samples=num_samples, jitter=False,
                           occ=occ)
    return np.asarray(out["fine"])


def test_sp_render_matches_single_device(setup):
    cfg, scene, params, rays = setup
    mesh = sp.make_sp_mesh(1, 8)
    render = sp.make_sp_render(cfg, mesh, num_samples=32,
                               compute_dtype=None)
    got = np.asarray(render(params, scene, *rays))
    want = _reference_render(cfg, scene, params, rays, 32)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_render_2d_mesh_dp_plus_sp(setup):
    cfg, scene, params, rays = setup
    mesh = sp.make_sp_mesh(2, 4)
    render = sp.make_sp_render(cfg, mesh, num_samples=32,
                               compute_dtype=None)
    got = np.asarray(render(params, scene, *rays))
    want = _reference_render(cfg, scene, params, rays, 32)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_render_with_occupancy_and_white_bg(setup):
    cfg, scene, params, rays = setup
    cfg_wb = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, white_background=True,
                                        occupancy=True,
                                        occupancy_resolution=16))
    occ = occupancy.init_grid(16, threshold=0.5)
    for k in range(2):
        occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                               jax.random.PRNGKey(k), scene["mu"],
                               scene["sigma"], num_cells=16 ** 3)
    mesh = sp.make_sp_mesh(1, 8)
    render = sp.make_sp_render(cfg_wb, mesh, num_samples=32,
                               compute_dtype=None)
    got = np.asarray(render(params, scene, *rays, occ=occ))
    want = _reference_render(cfg_wb, scene, params, rays, 32, occ=occ)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_render_rejects_bad_splits(setup):
    cfg, scene, params, rays = setup
    mesh = sp.make_sp_mesh(1, 8)
    with pytest.raises(ValueError):
        sp.make_sp_render(cfg, mesh, num_samples=30)


def _sdf_cfg_params(cfg, params):
    cfg_sdf = dataclasses.replace(
        cfg, mlp=dataclasses.replace(cfg.mlp, density_activation="sdf"),
        render=dataclasses.replace(cfg.render, use_sdf=True))
    params_sdf = dict(params, var=mlp_lib.init_var_model())
    return cfg_sdf, params_sdf


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_sp_render_sdf_matches_single_device(setup, mesh_shape):
    """VERDICT r4 item 7: the phi-ratio compositor's halo exchange —
    one neighbour phi per segment cut — reproduces the single-device
    SDF render exactly (up to float reassociation)."""
    cfg, scene, params, rays = setup
    cfg_sdf, params_sdf = _sdf_cfg_params(cfg, params)
    mesh = sp.make_sp_mesh(*mesh_shape)
    render = sp.make_sp_render(cfg_sdf, mesh, num_samples=32,
                               compute_dtype=None)
    got = np.asarray(render(params_sdf, scene, *rays))
    want = _reference_render(cfg_sdf, scene, params_sdf, rays, 32)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_render_sdf_with_occupancy(setup):
    cfg, scene, params, rays = setup
    cfg_sdf, params_sdf = _sdf_cfg_params(cfg, params)
    cfg_sdf = dataclasses.replace(
        cfg_sdf, render=dataclasses.replace(cfg_sdf.render, occupancy=True,
                                            occupancy_resolution=16))
    occ = occupancy.init_grid(16, threshold=0.5)
    for k in range(2):
        occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                               jax.random.PRNGKey(k), scene["mu"],
                               scene["sigma"], num_cells=16 ** 3)
    mesh = sp.make_sp_mesh(1, 8)
    render = sp.make_sp_render(cfg_sdf, mesh, num_samples=32,
                               compute_dtype=None)
    got = np.asarray(render(params_sdf, scene, *rays, occ=occ))
    want = _reference_render(cfg_sdf, scene, params_sdf, rays, 32, occ=occ)
    np.testing.assert_allclose(got, want, atol=2e-5)
