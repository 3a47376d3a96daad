"""Fused whole-image render (train/step.py render_image_fused) — the
serving fast path: one dispatch per frame instead of one per chunk."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.data import synthetic
from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.ops import occupancy
from human_body_reconstruction_tpu.ops import rays as rays_lib
from human_body_reconstruction_tpu.train import step as step_lib
from human_body_reconstruction_tpu.utils import config as C


def _setup(render=None):
    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=6, log2_table_size=12, n_min=4,
                          n_max=64),
        render=render or C.RenderConfig(num_samples=24))
    ds = synthetic.make_dataset(n_views=3, H=40, W=40)
    lo, hi = rays_lib.scene_bounds(40, 40, ds["K"], ds["c2ws"], 2.0, 6.0)
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {**he.init_encoder(k1, cfg.hash),
              "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                        cfg.dir_enc.out_dim)}
    return cfg, ds, scene, params


def test_fused_matches_chunk_loop_bitexact():
    cfg, ds, scene, params = _setup()
    a = step_lib.render_image(params, scene, 40, 40, ds["K"],
                              ds["c2ws"][0], cfg, num_samples=24, chunk=512)
    b = np.asarray(step_lib.render_image_fused(
        params, scene, 40, 40, ds["K"], ds["c2ws"][0], cfg,
        num_samples=24, chunk=512))
    np.testing.assert_array_equal(a, b)


def test_fused_pads_non_divisible_frames():
    cfg, ds, scene, params = _setup()
    a = step_lib.render_image(params, scene, 40, 40, ds["K"],
                              ds["c2ws"][1], cfg, num_samples=24, chunk=300)
    b = np.asarray(step_lib.render_image_fused(
        params, scene, 40, 40, ds["K"], ds["c2ws"][1], cfg,
        num_samples=24, chunk=300))
    np.testing.assert_array_equal(a, b)


def test_fused_bf16_close_to_f32():
    cfg, ds, scene, params = _setup()
    a = np.asarray(step_lib.render_image_fused(
        params, scene, 40, 40, ds["K"], ds["c2ws"][0], cfg,
        num_samples=24, chunk=512))
    b = np.asarray(step_lib.render_image_fused(
        params, scene, 40, 40, ds["K"], ds["c2ws"][0], cfg,
        num_samples=24, chunk=512, bf16=True))
    assert np.abs(a - b).max() < 5e-3


def test_fused_with_occupancy_and_eval_guided():
    render = C.RenderConfig(num_samples=24, occupancy=True,
                            occupancy_resolution=16, eval_guided=12,
                            occ_probes=24)
    cfg, ds, scene, params = _setup(render)
    occ = occupancy.init_grid(16, threshold=0.5)
    occ = occupancy.update(occ, lambda p: synthetic.blob_field(p)[1],
                           jax.random.PRNGKey(0), scene["mu"],
                           scene["sigma"], num_cells=16 ** 3)
    a = step_lib.render_image(params, scene, 40, 40, ds["K"],
                              ds["c2ws"][2], cfg, occ=occ, num_samples=24,
                              chunk=512)
    b = np.asarray(step_lib.render_image_fused(
        params, scene, 40, 40, ds["K"], ds["c2ws"][2], cfg, occ=occ,
        num_samples=24, chunk=512))
    np.testing.assert_array_equal(a, b)
