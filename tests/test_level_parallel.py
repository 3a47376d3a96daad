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


def test_lp_multi_step_matches_sequential(dataset):
    """make_lp_train_step(steps_per_call=3) == 3 sequential lp steps,
    bit-exact on a (2, 2) mesh (same program per step; only the
    dispatch grouping changes)."""
    cfg = small_cfg()
    scene = make_scene(dataset)
    mesh = lp.make_lp_mesh(2, 2)
    key = jax.random.PRNGKey(5)

    def run(fused):
        state, tx = build_state(cfg)
        state = lp.shard_lp_state(state, mesh)
        step = lp.make_lp_train_step(cfg, tx, batch_size=256, mesh=mesh,
                                     steps_per_call=3 if fused else 1)
        for _ in range(1 if fused else 3):
            state, m = step(state, scene, dataset["images"],
                            dataset["c2ws"], dataset["K"], key)
        assert int(np.asarray(state.step)) == 3
        return np.asarray(state.params["table"]), m

    tbl_seq, _ = run(fused=False)
    tbl_fused, m = run(fused=True)
    np.testing.assert_array_equal(tbl_seq, tbl_fused)
    assert np.isfinite(float(m["loss"]))


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


def test_lp_rejects_bad_shapes():
    mesh = lp.make_lp_mesh(1, 4)
    with pytest.raises(ValueError, match="not divisible"):
        lp.make_lp_train_step(
            dataclasses.replace(small_cfg(),
                                hash=cfg_lib.HashConfig(num_levels=6,
                                                        n_min=4, n_max=64)),
            None, 256, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        # 8 levels, 2 dense -> 6 hashed, not divisible by 4
        lp.make_lp_train_step(small_cfg(dense_levels=2), None, 256, mesh)


def test_lp_dense_plus_hashed_render_matches_single_device(dataset):
    """Dense coarse levels replicate; only the hashed ladder shards.
    encode_params must gather the hashed blocks BEFORE concatenating the
    dense part, or the MLP layout scrambles."""
    from human_body_reconstruction_tpu.train.trainer import init_params

    cfg = small_cfg(dense_levels=2)        # 2 dense + 6 hashed
    scene = make_scene(dataset)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = 64
    o, d, n = rays_lib.full_image_rays(dataset["H"], dataset["W"],
                                       dataset["K"], dataset["c2ws"][0])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(3)
    ref = step_lib.render_chunk(params, scene, o, d, n, key,
                                cfg=cfg, occ=None, num_samples=16,
                                hierarchical=False)
    mesh = lp.make_lp_mesh(2, 3)           # 6 hashed levels over 3 chips
    state, _ = state_lib.create_train_state(params, cfg.train, 10)
    sharded = lp.shard_lp_state(state, mesh)
    render = lp.make_lp_render(cfg, mesh, num_samples=16)
    got = render(sharded.params, scene, o, d, n, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_lp_int8_flagship_mode_trains(dataset):
    """The flagship int8+grad_subsample training path under a 2-D
    (data, level) mesh: loss decreases and the table stays sharded."""
    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=4, features_per_level=4,
                                log2_table_size=10, n_min=4, n_max=64,
                                stochastic_train=True, packed=True,
                                pack_format="int8", grad_subsample=True),
        render=cfg_lib.RenderConfig(num_samples=16),
        train=cfg_lib.TrainConfig(ray_batch=512),
    )
    scene = make_scene(dataset)
    state, tx = build_state(cfg)
    mesh = lp.make_lp_mesh(2, 2)
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
    shard_shapes = {s.data.shape for s in
                    state.params["table"].addressable_shards}
    assert shard_shapes == {(2, 1024, 4)}, shard_shapes


def test_lp_stochastic_features_unbiased(dataset):
    """E over keys of the lp stochastic-corner features equals the exact
    interpolant (the estimator stays unbiased under the per-chip RNG
    fold)."""
    from human_body_reconstruction_tpu.models import nerf

    cfg = small_cfg(stochastic_train=True)
    scene = make_scene(dataset)
    table = he.init_table(jax.random.PRNGKey(0), cfg.hash)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3),
                             minval=-1.0, maxval=1.0)
    cfg_lp = lp._lp_cfg(cfg)
    mesh = lp.make_lp_mesh(1, 4)
    scales = lp.level_scales_array(cfg)

    from jax.sharding import PartitionSpec as P

    def enc(table_local, scales_local, key):
        p = {"table": table_local, "lp_scales": scales_local}
        return nerf.encode_points(p, scene, pts, cfg_lp, encode_key=key)

    sharded = jax.shard_map(
        enc, mesh=mesh,
        in_specs=(P(lp.LEVEL_AXIS), P(lp.LEVEL_AXIS), P()),
        out_specs=P(), check_vma=False)
    keys = jax.random.split(jax.random.PRNGKey(2), 256)
    feats = jax.vmap(lambda k: sharded(table, scales, k))(keys)
    exact = nerf.encode_points({"table": table}, scene, pts, cfg)
    se = np.std(np.asarray(feats), axis=0) / np.sqrt(len(keys))
    err = np.abs(np.mean(np.asarray(feats), axis=0) - np.asarray(exact))
    assert np.mean(err <= 4 * se + 1e-6) > 0.97, np.mean(err <= 4 * se)


def test_lp_cp_render_matches_single_device(dataset):
    """variant='cp' under the level mesh axis shards the RANK axis (there
    are no lookups to divide); the all_gather + reorder in encode_params
    must reproduce the single-chip column order exactly."""
    from human_body_reconstruction_tpu.train.trainer import init_params

    cfg = small_cfg(variant="cp", cp_rank=8)
    scene = make_scene(dataset)
    params = init_params(jax.random.PRNGKey(0), cfg)
    B = 64
    o, d, n = rays_lib.full_image_rays(dataset["H"], dataset["W"],
                                       dataset["K"], dataset["c2ws"][0])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(3)
    ref = step_lib.render_chunk(params, scene, o, d, n, key,
                                cfg=cfg, occ=None, num_samples=16,
                                hierarchical=False)
    for n_data, n_level in ((2, 2), (1, 4), (2, 4)):
        mesh = lp.make_lp_mesh(n_data, n_level)
        state, _ = state_lib.create_train_state(params, cfg.train, 10)
        sharded = lp.shard_lp_state(state, mesh)
        render = lp.make_lp_render(cfg, mesh, num_samples=16)
        got = render(sharded.params, scene, o, d, n, key)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_lp_cp_dense_plus_cp_render_matches_single_device(dataset):
    """dense coarse levels (replicated) + CP fine levels (rank-sharded)
    compose: the dense block must concatenate AFTER the rank gather."""
    from human_body_reconstruction_tpu.train.trainer import init_params

    cfg = small_cfg(variant="cp", cp_rank=8, dense_levels=2)
    scene = make_scene(dataset)
    params = init_params(jax.random.PRNGKey(1), cfg)
    B = 64
    o, d, n = rays_lib.full_image_rays(dataset["H"], dataset["W"],
                                       dataset["K"], dataset["c2ws"][1])
    o, d, n = o[:B], d[:B], n[:B]
    key = jax.random.PRNGKey(5)
    ref = step_lib.render_chunk(params, scene, o, d, n, key,
                                cfg=cfg, occ=None, num_samples=16,
                                hierarchical=False)
    mesh = lp.make_lp_mesh(2, 4)
    state, _ = state_lib.create_train_state(params, cfg.train, 10)
    sharded = lp.shard_lp_state(state, mesh)
    render = lp.make_lp_render(cfg, mesh, num_samples=16)
    got = render(sharded.params, scene, o, d, n, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_lp_cp_training_reduces_loss_and_stays_sharded(dataset):
    """CP rank-parallel training on a (2, 2) mesh: loss decreases, and
    the factor lines AND their adam moments keep their rank sharding
    through optimizer updates."""
    cfg = small_cfg(variant="cp", cp_rank=8)
    scene = make_scene(dataset)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "lines": __import__(
            "human_body_reconstruction_tpu.ops.lowrank",
            fromlist=["init_lines"]).init_lines(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    state, tx = state_lib.create_train_state(params, cfg.train, 50)
    mesh = lp.make_lp_mesh(2, 2)
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
    line0 = state.params["lines"][0]
    shard_shapes = {s.data.shape for s in line0.addressable_shards}
    dim, g, _ = line0.shape
    assert shard_shapes == {(dim, g, 4)}, shard_shapes


def test_lp_cp_matches_single_device_steps(dataset):
    """Rank sharding is a layout choice: (1,1) and (1,4) meshes take the
    same training steps (same loss trajectory, lines agree closely)."""
    cfg = small_cfg(variant="cp", cp_rank=8)
    scene = make_scene(dataset)
    results = {}
    for n_level in (1, 4):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        from human_body_reconstruction_tpu.ops import lowrank
        params = {
            "lines": lowrank.init_lines(k1, cfg.hash),
            "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                      cfg.dir_enc.out_dim),
        }
        state, tx = state_lib.create_train_state(params, cfg.train, 50)
        mesh = lp.make_lp_mesh(1, n_level)
        state = lp.shard_lp_state(state, mesh)
        step = lp.make_lp_train_step(cfg, tx, batch_size=256, mesh=mesh)
        losses = []
        for _ in range(3):
            state, m = step(state, scene, dataset["images"],
                            dataset["c2ws"], dataset["K"],
                            jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        results[n_level] = (np.asarray(state.params["lines"][0]), losses)
    np.testing.assert_allclose(results[4][1], results[1][1], rtol=1e-5)
    diff = np.abs(results[4][0] - results[1][0])
    assert diff.max() < 5e-3, diff.max()


def test_lp_rejects_bad_cp_rank():
    mesh = lp.make_lp_mesh(1, 4)
    with pytest.raises(ValueError, match="cp_rank"):
        lp.make_lp_train_step(small_cfg(variant="cp", cp_rank=6), None,
                              256, mesh)


def test_trainer_level_parallel_e2e(tmp_path, dataset):
    """Full Trainer loop on a (2, 4) mesh: occupancy refresh on sharded
    params, lp eval render, checkpoint save + re-sharded resume."""
    from human_body_reconstruction_tpu.train.trainer import Trainer

    cfg = cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=8, log2_table_size=10, n_min=4,
                                n_max=64),
        render=cfg_lib.RenderConfig(num_samples=16, occupancy=True,
                                    occupancy_resolution=16),
        train=cfg_lib.TrainConfig(ray_batch=512, occ_warmup_steps=5,
                                  update_rate=10),
    )
    tr = Trainer(cfg=cfg, ds=dataset, out_dir=str(tmp_path),
                 write_metrics=False, data_parallel=True, level_parallel=4,
                 total_steps=30)
    assert tr.mesh.shape == {"data": 2, "level": 4}
    tr.run(30, log_every=0)
    psnr = tr.eval_render(0, num_samples=16, write_png=False)
    assert np.isfinite(psnr) and psnr > 5.0, psnr
    shard_shapes = {s.data.shape for s in
                    tr.state.params["table"].addressable_shards}
    assert shard_shapes == {(2, 1024, 2)}, shard_shapes
    tr.save()
    tr2 = Trainer(cfg=cfg, ds=dataset, out_dir=str(tmp_path),
                  write_metrics=False, data_parallel=True, level_parallel=4,
                  total_steps=30)
    tr2.load()
    assert int(np.asarray(tr2.state.step)) == 30
    tr2.run(2, log_every=0)
    assert int(np.asarray(tr2.state.step)) == 32


def test_lp_cp_tv_matches_single_device_steps(dataset):
    """cp_tv_weight > 0 under rank parallelism: the global-rank
    normalisation + level-axis psum (train/step.py loss_fn) keeps the
    regularised step EXACT across level-axis extents — same loss and
    cp_tv trajectories, same lines (ADVICE r2 fix)."""
    cfg = small_cfg(variant="cp", cp_rank=8)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, cp_tv_weight=0.5))
    scene = make_scene(dataset)
    results = {}
    for n_level in (1, 4):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        from human_body_reconstruction_tpu.ops import lowrank
        params = {
            "lines": lowrank.init_lines(k1, cfg.hash),
            "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                      cfg.dir_enc.out_dim),
        }
        state, tx = state_lib.create_train_state(params, cfg.train, 50)
        mesh = lp.make_lp_mesh(1, n_level)
        state = lp.shard_lp_state(state, mesh)
        step = lp.make_lp_train_step(cfg, tx, batch_size=256, mesh=mesh)
        losses, tvs = [], []
        for _ in range(3):
            state, m = step(state, scene, dataset["images"],
                            dataset["c2ws"], dataset["K"],
                            jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
            tvs.append(float(m["cp_tv"]))
        results[n_level] = (np.asarray(state.params["lines"][0]),
                            losses, tvs)
    np.testing.assert_allclose(results[4][1], results[1][1], rtol=1e-5)
    np.testing.assert_allclose(results[4][2], results[1][2], rtol=1e-5)
    diff = np.abs(results[4][0] - results[1][0])
    assert diff.max() < 5e-3, diff.max()


def test_lp_cp_tv_warmup_gates_tv(dataset):
    """cp_tv_warmup must suppress TV under the level/rank-parallel step
    (ADVICE r3 high: loss_fn lost the step argument here).  While
    step < warmup the step must match a cp_tv_weight=0 step exactly,
    and the gate must release once step crosses the warmup."""
    scene = make_scene(dataset)
    mesh = lp.make_lp_mesh(1, 4)

    def run(tv_weight, warmup, n_steps=3):
        cfg = small_cfg(variant="cp", cp_rank=8)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, cp_tv_weight=tv_weight, cp_tv_warmup=warmup))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        from human_body_reconstruction_tpu.ops import lowrank
        params = {
            "lines": lowrank.init_lines(k1, cfg.hash),
            "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                      cfg.dir_enc.out_dim),
        }
        state, tx = state_lib.create_train_state(params, cfg.train, 10)
        state = lp.shard_lp_state(state, mesh)
        step = lp.make_lp_train_step(cfg, tx, batch_size=256, mesh=mesh)
        losses = []
        for _ in range(n_steps):
            state, m = step(state, scene, dataset["images"],
                            dataset["c2ws"], dataset["K"],
                            jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        return np.asarray(state.params["lines"][0]), losses

    lines_warm, loss_warm = run(0.5, warmup=100)
    lines_off, loss_off = run(0.0, warmup=0)
    lines_tv, loss_tv = run(0.5, warmup=0)
    np.testing.assert_array_equal(lines_warm, lines_off)
    np.testing.assert_allclose(loss_warm, loss_off, rtol=1e-6)
    assert not np.array_equal(lines_tv, lines_off)
    # warmup=2 releases the gate at step 2: first two steps match the
    # TV-off run, the third diverges (TV now in the loss)
    _, loss_w2 = run(0.5, warmup=2)
    np.testing.assert_allclose(loss_w2[:2], loss_off[:2], rtol=1e-6)
    assert loss_w2[2] != pytest.approx(loss_off[2], rel=1e-7)
