"""AOT executable cache (utils/aot.py): correctness, disk round-trip,
Trainer integration."""

import functools
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.utils import aot


@functools.partial(jax.jit, static_argnames=("n",),
                   donate_argnames=("state",))
def _toy_step(state, x, n):
    return state + x * n, jnp.sum(x * n)


def test_cached_jit_matches_plain_jit(tmp_path):
    cache = aot.AOTCache(str(tmp_path))
    wrapped = aot.CachedJit(_toy_step, cache, static_argnames=("n",))
    s = jnp.ones((16,))
    x = jnp.arange(16.0)
    ref_state, ref_sum = _toy_step(jnp.ones((16,)), x, n=3)
    got_state, got_sum = wrapped(jnp.ones((16,)), x, n=3)
    np.testing.assert_allclose(np.asarray(got_state), np.asarray(ref_state))
    assert float(got_sum) == float(ref_sum)
    assert cache.misses == 1 and cache.hits == 0
    # same signature: in-memory memo, no new cache traffic
    wrapped(jnp.ones((16,)), x, n=3)
    assert cache.misses == 1 and cache.hits == 0
    # different static: a fresh executable
    _, s5 = wrapped(jnp.ones((16,)), x, n=5)
    assert float(s5) == float(jnp.sum(x * 5))
    assert cache.misses == 2


def test_disk_round_trip_hits_in_fresh_cache(tmp_path):
    c1 = aot.AOTCache(str(tmp_path))
    w1 = aot.CachedJit(_toy_step, c1, static_argnames=("n",))
    w1(jnp.ones((8,)), jnp.arange(8.0), n=2)
    assert c1.misses == 1
    assert len(glob.glob(os.path.join(str(tmp_path), "*.jaxexec"))) == 1
    # a new process is simulated by a fresh AOTCache + CachedJit
    c2 = aot.AOTCache(str(tmp_path))
    w2 = aot.CachedJit(_toy_step, c2, static_argnames=("n",))
    _, tot = w2(jnp.ones((8,)), jnp.arange(8.0), n=2)
    assert c2.hits == 1 and c2.misses == 0
    assert float(tot) == float(jnp.sum(jnp.arange(8.0) * 2))


def test_dynamic_kwargs_and_none_leaves(tmp_path):
    @jax.jit
    def f(a, b=None):
        return a if b is None else a + b

    cache = aot.AOTCache(str(tmp_path))
    w = aot.CachedJit(f, cache)
    a = jnp.ones((4,))
    np.testing.assert_allclose(np.asarray(w(a, b=None)), np.asarray(a))
    np.testing.assert_allclose(np.asarray(w(a, b=a)), np.asarray(a * 2))
    assert cache.misses == 2


def test_corrupt_cache_entry_recompiles(tmp_path):
    c1 = aot.AOTCache(str(tmp_path))
    w1 = aot.CachedJit(_toy_step, c1, static_argnames=("n",))
    w1(jnp.ones((4,)), jnp.arange(4.0), n=2)
    (path,) = glob.glob(os.path.join(str(tmp_path), "*.jaxexec"))
    with open(path, "wb") as f:
        f.write(b"garbage")
    c2 = aot.AOTCache(str(tmp_path))
    w2 = aot.CachedJit(_toy_step, c2, static_argnames=("n",))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _, tot = w2(jnp.ones((4,)), jnp.arange(4.0), n=2)
    assert float(tot) == float(jnp.sum(jnp.arange(4.0) * 2))
    assert c2.misses == 1


def test_trainer_with_aot_cache_trains_and_evals(tmp_path):
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.train.trainer import Trainer
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=4, log2_table_size=10, n_min=4,
                          n_max=64),
        render=C.RenderConfig(num_samples=16),
        train=C.TrainConfig(ray_batch=512))
    ds = synthetic.make_dataset(n_views=3, H=24, W=24)
    tr = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path / "out"),
                 write_metrics=False, aot_cache=str(tmp_path / "aot"),
                 total_steps=40)
    tr.run(40, log_every=0)
    psnr = tr.eval_render(0, num_samples=16, write_png=False)
    assert np.isfinite(psnr)
    assert tr._aot.misses >= 1
    # second trainer at the identical config: executables come from disk
    tr2 = Trainer(cfg=cfg, ds=ds, out_dir=str(tmp_path / "out2"),
                  write_metrics=False, aot_cache=str(tmp_path / "aot"),
                  total_steps=40)
    tr2.run(2, log_every=0)
    assert tr2._aot.hits >= 1 and tr2._aot.misses == 0


def test_mesh_sweep_aot_cache_is_checkpoint_independent(tmp_path):
    """The sweep HLO must not bake params in as constants: two different
    checkpoints at the same config share one cached executable."""
    from human_body_reconstruction_tpu.pipeline import mesh_export
    from human_body_reconstruction_tpu.train.trainer import init_params
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=3, log2_table_size=8, n_min=4,
                          n_max=16))
    scene = {"mu": jnp.zeros(3), "sigma": jnp.float32(1.0),
             "min_bound": jnp.zeros(3), "max_bound": jnp.ones(3)}
    cache_dir = str(tmp_path / "aot")
    for seed in (0, 1):
        params = init_params(jax.random.PRNGKey(seed), cfg)
        grid = mesh_export.density_rgb_grid(
            params, scene, cfg, resolution=8, chunk=256,
            aot_cache=cache_dir)
        assert grid.shape == (8, 8, 8, 4) and np.all(np.isfinite(grid))
    files = glob.glob(os.path.join(cache_dir, "*.jaxexec"))
    assert len(files) == 1, files
