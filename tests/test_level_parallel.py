"""Level-parallel (table-sharded) encoder/trainer tests on the virtual
8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.data import synthetic
from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.ops import hash_encoding as he, rays as rays_lib
from human_body_reconstruction_tpu.parallel import level_parallel as lp
from human_body_reconstruction_tpu.train import state as state_lib
from human_body_reconstruction_tpu.train import step as step_lib
from human_body_reconstruction_tpu.utils import config as cfg_lib


def small_cfg(**hash_kw):
    return cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=8, log2_table_size=10, n_min=4,
                                n_max=64, **hash_kw),
        render=cfg_lib.RenderConfig(num_samples=16),
        train=cfg_lib.TrainConfig(ray_batch=512),
    )


def build_state(cfg, steps=50):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "table": he.init_table(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    return state_lib.create_train_state(params, cfg.train, steps)


@pytest.fixture(scope="module")
def dataset():
    return synthetic.make_dataset(n_views=4, H=24, W=24)


def make_scene(ds):
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    return {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
            "min_bound": lo, "max_bound": hi}


def test_lp_render_matches_single_device(dataset):
    """Sharding levels over 4 chips must not change the rendered image."""
    cfg = small_cfg()
    scene = make_scene(dataset)
    state, _ = build_state(cfg)
    B = 128
    o, d, n = rays_lib.full_image_rays(dataset["H"], dataset["W"],
                                       dataset["K"], dataset["c2ws"][0])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(3)
    ref = step_lib.render_chunk(state.params, scene, o, d, n, key,
                                cfg=cfg, occ=None, num_samples=16,
                                hierarchical=False)
    for n_data, n_level in ((1, 4), (2, 4), (4, 2)):
        mesh = lp.make_lp_mesh(n_data, n_level)
        sharded = lp.shard_lp_state(state, mesh)
        render = lp.make_lp_render(cfg, mesh, num_samples=16)
        got = render(sharded.params, scene, o, d, n, key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_lp_step_equal_across_level_extents(dataset):
    """(1,1), (1,2), (1,8) meshes take the same steps: level sharding is
    a layout choice, not a semantics choice.  Tolerance note: gradients
    reach the table through fp32 scatter-adds whose reassociation
    differs between XLA programs, and adam amplifies sign flips of
    near-zero gradients to O(lr) — so losses must agree tightly but a
    vanishing fraction of table entries may differ at the 1e-3 scale."""
    cfg = small_cfg()
    scene = make_scene(dataset)
    results = {}
    for n_level in (1, 2, 8):
        state, tx = build_state(cfg)
        mesh = lp.make_lp_mesh(1, n_level)
        state = lp.shard_lp_state(state, mesh)
        step = lp.make_lp_train_step(cfg, tx, batch_size=256, mesh=mesh)
        losses = []
        for _ in range(3):
            state, m = step(state, scene, dataset["images"],
                            dataset["c2ws"], dataset["K"],
                            jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        results[n_level] = (np.asarray(state.params["table"]), losses)
    for n_level in (2, 8):
        diff = np.abs(results[n_level][0] - results[1][0])
        assert np.mean(diff < 1e-5) > 0.999, np.mean(diff < 1e-5)
        assert diff.max() < 5e-3, diff.max()
        np.testing.assert_allclose(results[n_level][1], results[1][1],
                                   rtol=1e-5)


def test_lp_training_reduces_loss_2d_mesh(dataset):
    cfg = small_cfg()
    scene = make_scene(dataset)
    state, tx = build_state(cfg)
    mesh = lp.make_lp_mesh(2, 4)
    state = lp.shard_lp_state(state, mesh)
    step = lp.make_lp_train_step(cfg, tx, batch_size=512, mesh=mesh)
    first = last = None
    for _ in range(40):
        state, m = step(state, scene, dataset["images"], dataset["c2ws"],
                        dataset["K"], jax.random.PRNGKey(0))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first * 0.7, (first, last)
    # the table (and its adam moments) stay level-sharded through updates
    shard_shapes = {s.data.shape for s in
                    state.params["table"].addressable_shards}
    assert shard_shapes == {(2, 1024, 2)}, shard_shapes


def test_lp_cell_variant_matches_single_device(dataset):
    cfg = small_cfg(variant="cell")
    scene = make_scene(dataset)
    state, _ = build_state(cfg)
    B = 64
    o, d, n = rays_lib.full_image_rays(dataset["H"], dataset["W"],
                                       dataset["K"], dataset["c2ws"][1])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(5)
    ref = step_lib.render_chunk(state.params, scene, o, d, n, key,
                                cfg=cfg, occ=None, num_samples=16,
                                hierarchical=False)
    mesh = lp.make_lp_mesh(2, 2)
    sharded = lp.shard_lp_state(state, mesh)
    render = lp.make_lp_render(cfg, mesh, num_samples=16)
    got = render(sharded.params, scene, o, d, n, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_lp_rejects_unsupported_modes():
    mesh = lp.make_lp_mesh(1, 4)
    with pytest.raises(ValueError, match="exact corner/cell"):
        lp.make_lp_train_step(small_cfg(stochastic_train=True), None,
                              256, mesh)
    with pytest.raises(ValueError, match="divisible"):
        lp.make_lp_train_step(
            dataclasses.replace(small_cfg(),
                                hash=cfg_lib.HashConfig(num_levels=6,
                                                        n_min=4, n_max=64)),
            None, 256, mesh)
    with pytest.raises(ValueError, match="dense_levels"):
        lp.make_lp_train_step(small_cfg(dense_levels=2), None, 256, mesh)
