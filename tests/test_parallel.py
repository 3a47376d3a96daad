"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.data import synthetic
from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.ops import hash_encoding as he, rays as rays_lib
from human_body_reconstruction_tpu.parallel import data_parallel as dp
from human_body_reconstruction_tpu.train import state as state_lib
from human_body_reconstruction_tpu.utils import config as cfg_lib


def small_cfg():
    return cfg_lib.PipelineConfig(
        hash=cfg_lib.HashConfig(num_levels=4, log2_table_size=10, n_min=4,
                                n_max=64),
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


def test_mesh_has_8_devices():
    mesh = dp.make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_runs_and_reduces_loss(dataset):
    cfg = small_cfg()
    mesh = dp.make_mesh()
    state, tx = build_state(cfg)
    step = dp.make_dp_train_step(cfg, tx, batch_size=512, mesh=mesh)
    scene = make_scene(dataset)
    state = dp.replicate_to_mesh(state, mesh)
    key = jax.random.PRNGKey(0)
    first = last = None
    for _ in range(40):
        state, m = step(state, scene, dataset["images"], dataset["c2ws"],
                        dataset["K"], key)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first * 0.7, (first, last)
    assert int(state.step) == 40


def test_dp_params_stay_replicated_and_identical(dataset):
    cfg = small_cfg()
    mesh = dp.make_mesh()
    state, tx = build_state(cfg)
    step = dp.make_dp_train_step(cfg, tx, batch_size=256, mesh=mesh)
    scene = make_scene(dataset)
    state = dp.replicate_to_mesh(state, mesh)
    state, _ = step(state, scene, dataset["images"], dataset["c2ws"],
                    dataset["K"], jax.random.PRNGKey(1))
    # replicated output: every shard of the table must be byte-identical
    table = state.params["table"]
    shards = [np.asarray(s.data) for s in table.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_multi_step_matches_sequential(dataset):
    """make_dp_train_step(steps_per_call=4) == 4 sequential dp steps,
    bit-exact (the per-chip key fold uses state.step inside the scan)."""
    cfg = small_cfg()
    mesh = dp.make_mesh()
    scene = make_scene(dataset)
    key = jax.random.PRNGKey(7)

    def run(fused):
        state, tx = build_state(cfg, steps=8)
        state = dp.replicate_to_mesh(state, mesh)
        if fused:
            step = dp.make_dp_train_step(cfg, tx, 512, mesh,
                                         steps_per_call=4)
            for _ in range(2):
                state, m = step(state, scene, dataset["images"],
                                dataset["c2ws"], dataset["K"], key)
        else:
            step = dp.make_dp_train_step(cfg, tx, 512, mesh)
            for _ in range(8):
                state, m = step(state, scene, dataset["images"],
                                dataset["c2ws"], dataset["K"], key)
        assert int(np.asarray(state.step)) == 8
        return np.asarray(state.params["table"]), m

    tbl_seq, _ = run(fused=False)
    tbl_fused, m = run(fused=True)
    np.testing.assert_array_equal(tbl_seq, tbl_fused)
    assert np.isfinite(float(m["loss"]))


def test_dp_batch_not_divisible_raises():
    cfg = small_cfg()
    mesh = dp.make_mesh()
    state, tx = build_state(cfg)
    with pytest.raises(ValueError):
        dp.make_dp_train_step(cfg, tx, batch_size=100, mesh=mesh)


def test_dp_matches_single_device_gradient_direction(dataset):
    """DP with n devices and global batch B should optimize comparably to
    single-device batch B: after the same number of steps from the same
    init, losses land in the same ballpark."""
    from human_body_reconstruction_tpu.train import step as step_lib

    cfg = small_cfg()
    scene = make_scene(dataset)
    steps = 60

    mesh = dp.make_mesh()
    state, tx = build_state(cfg, steps)
    dstep = dp.make_dp_train_step(cfg, tx, batch_size=1024, mesh=mesh)
    dp_state = dp.replicate_to_mesh(state, mesh)
    key = jax.random.PRNGKey(3)
    for _ in range(steps):
        dp_state, dm = dstep(dp_state, scene, dataset["images"],
                             dataset["c2ws"], dataset["K"], key)

    state1, tx1 = build_state(cfg, steps)
    for _ in range(steps):
        state1, sm = step_lib.train_step(
            state1, scene, dataset["images"], dataset["c2ws"], dataset["K"],
            key, cfg, tx1, 1024)

    dp_loss, s_loss = float(dm["loss"]), float(sm["loss"])
    assert dp_loss < 0.06 and s_loss < 0.06, (dp_loss, s_loss)
    assert dp_loss < 3 * s_loss + 0.01


def test_dp_render_matches_single_device(dataset):
    """Mesh-sharded eval render must equal the single-device render."""
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.ops import rays as rays_lib

    cfg = small_cfg()
    mesh = dp.make_mesh()
    state, tx = build_state(cfg)
    scene = make_scene(dataset)
    render = dp.make_dp_render(cfg, mesh, num_samples=16)

    o, d, n = rays_lib.full_image_rays(16, 16, dataset["K"],
                                       dataset["c2ws"][0])
    key = jax.random.PRNGKey(0)
    got = render(state.params, scene, o, d, n, key)
    want = nerf.render_rays(state.params, scene, o, d, n, key, cfg,
                            num_samples=16, jitter=False,
                            compute_dtype=jnp.bfloat16)["fine"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_dp_cp_tv_warmup_gates_tv(dataset):
    """cp_tv_warmup must suppress the TV term under the data-parallel
    step (ADVICE r3 high: loss_fn was called without step, so the gate
    silently never engaged and TV applied from step 0).  A step taken
    while step < warmup must be bit-identical to a cp_tv_weight=0 step,
    and differ from a warmup=0 step."""
    import dataclasses
    from human_body_reconstruction_tpu.ops import lowrank

    def cp_cfg(tv_weight, warmup):
        return cfg_lib.PipelineConfig(
            hash=cfg_lib.HashConfig(variant="cp", cp_rank=4, num_levels=4,
                                    n_min=4, n_max=32),
            render=cfg_lib.RenderConfig(num_samples=16),
            train=cfg_lib.TrainConfig(ray_batch=512, cp_tv_weight=tv_weight,
                                      cp_tv_warmup=warmup),
        )

    mesh = dp.make_mesh()
    scene = make_scene(dataset)

    def one_step(tv_weight, warmup):
        cfg = cp_cfg(tv_weight, warmup)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {
            "lines": lowrank.init_lines(k1, cfg.hash),
            "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                      cfg.dir_enc.out_dim),
        }
        state, tx = state_lib.create_train_state(params, cfg.train, 10)
        state = dp.replicate_to_mesh(state, mesh)
        step = dp.make_dp_train_step(cfg, tx, batch_size=512, mesh=mesh)
        state, m = step(state, scene, dataset["images"], dataset["c2ws"],
                        dataset["K"], jax.random.PRNGKey(3))
        return (np.asarray(state.params["lines"][0]), float(m["loss"]))

    lines_warm, loss_warm = one_step(0.5, warmup=100)
    lines_off, loss_off = one_step(0.0, warmup=0)
    lines_tv, loss_tv = one_step(0.5, warmup=0)
    # gated step == TV-off step, exactly
    np.testing.assert_array_equal(lines_warm, lines_off)
    assert loss_warm == pytest.approx(loss_off, rel=1e-6)
    # and the ungated step actually differs (TV is non-trivial here)
    assert loss_tv > loss_off
    assert not np.array_equal(lines_tv, lines_off)
