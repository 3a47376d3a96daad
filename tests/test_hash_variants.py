"""Cell-variant and stochastic hash-encoding tests."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.utils.config import HashConfig


def cfg_cell(**kw):
    kw.setdefault("num_levels", 4)
    kw.setdefault("log2_table_size", 8)
    kw.setdefault("n_min", 4)
    kw.setdefault("n_max", 32)
    kw.setdefault("variant", "cell")
    return HashConfig(**kw)


def numpy_cell_encode(table, x, mu, sigma, cfg):
    """Independent loop reimplementation of the cell variant."""
    L, T, P = table.shape
    F, C = cfg.features_per_level, cfg.corners
    scales = he.level_scales(cfg)
    out = np.zeros((x.shape[0], L * F))
    xn = (np.asarray(x, np.float64) - mu) / sigma
    for n in range(x.shape[0]):
        for l in range(L):
            xl = xn[n] * scales[l]
            x0 = np.floor(xl).astype(np.int64)
            frac = xl - x0
            h = np.uint64(0)
            for d in range(cfg.dim):
                h ^= np.uint64((np.uint64(x0[d] & 0xFFFFFFFF)
                                * np.uint64(he.PRIMES[d])) & 0xFFFFFFFF)
            idx = int(h & np.uint64(0xFFFFFFFF)) % T
            row = np.asarray(table[l, idx], np.float64)
            for c in range(C):
                offs = [(c >> d) & 1 for d in range(cfg.dim)]
                w = 1.0
                for d in range(cfg.dim):
                    w *= frac[d] if offs[d] else (1 - frac[d])
                for f in range(F):
                    out[n, l * F + f] += w * row[c * F + f]
    return out


def test_cell_table_shape():
    cfg = cfg_cell()
    t = he.init_table(jax.random.PRNGKey(0), cfg)
    assert t.shape == (4, 256, 8 * 2)


def test_cell_matches_numpy_reference():
    cfg = cfg_cell()
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (13, 3), minval=-1,
                           maxval=2)
    got = np.asarray(he.hash_encode_cell(table, x, 0.0, 1.0, cfg))
    expect = numpy_cell_encode(np.asarray(table), np.asarray(x), 0.0, 1.0,
                               cfg)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_cell_continuous_inside_cell():
    """Inside one cell the field is trilinear (continuous): nearby points
    in the same cell give nearby encodings."""
    cfg = cfg_cell(num_levels=1, n_min=4, n_max=4)
    table = he.init_table(jax.random.PRNGKey(2), cfg)
    x1 = jnp.asarray([[0.30, 0.30, 0.30]])
    x2 = jnp.asarray([[0.301, 0.30, 0.30]])
    e1 = he.hash_encode_cell(table, x1, 0.0, 1.0, cfg)
    e2 = he.hash_encode_cell(table, x2, 0.0, 1.0, cfg)
    assert float(jnp.max(jnp.abs(e1 - e2))) < 1e-3


def test_cell_gradient_mass():
    cfg = cfg_cell()
    table = he.init_table(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray([[0.3, 0.4, 0.5]])

    def loss(tb):
        return jnp.sum(he.hash_encode_cell(tb, x, 0.0, 1.0, cfg))

    g = np.asarray(jax.grad(loss)(table))
    # exactly one bucket touched per level; weights over corners sum to 1
    touched = (np.abs(g).sum(-1) > 0).sum(axis=-1)
    np.testing.assert_array_equal(touched, np.ones(4))
    np.testing.assert_allclose(g.sum(axis=(1, 2)), 2.0 * np.ones(4),
                               rtol=1e-5)  # F=2 features x weight-sum 1


def test_stochastic_unbiased():
    cfg = HashConfig(num_levels=2, log2_table_size=8, n_min=4, n_max=16)
    table = he.init_table(jax.random.PRNGKey(4), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (5, 3))
    exact = np.asarray(he.hash_encode(table, x, 0.0, 1.0, cfg))
    keys = jax.random.split(jax.random.PRNGKey(6), 3000)
    samples = jax.vmap(
        lambda k: he.hash_encode_stochastic(table, x, 0.0, 1.0, cfg, k))(keys)
    mean = np.asarray(jnp.mean(samples, axis=0))
    np.testing.assert_allclose(mean, exact, atol=2e-5 + 0.05 * np.abs(exact).max())


def test_dispatcher():
    cfg = cfg_cell()
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3))
    out = he.encode(table, x, 0.0, 1.0, cfg)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(he.hash_encode_cell(table, x, 0.0,
                                                              1.0, cfg)))
    cfg2 = HashConfig(num_levels=2, log2_table_size=8, n_min=4, n_max=16)
    t2 = he.init_table(jax.random.PRNGKey(0), cfg2)
    try:
        he.encode(t2, x, 0.0, 1.0, cfg2, stochastic=True)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_cell_variant_end_to_end_training():
    """The cell variant must train the blob scene to good PSNR too."""
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=8, log2_table_size=12, n_min=4,
                          n_max=128, variant="cell"),
        render=C.RenderConfig(num_samples=32),
        train=C.TrainConfig(ray_batch=1024),
    )
    ds = synthetic.make_dataset(n_views=6, H=40, W=40)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, 300)
    for _ in range(300):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 1024)
    assert float(m["psnr"]) > 22.0, float(m["psnr"])


def test_stochastic_end_to_end_training():
    """Stochastic-corner training must still converge on the blob scene."""
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=8, log2_table_size=12, n_min=4,
                          n_max=128, stochastic_train=True),
        render=C.RenderConfig(num_samples=32),
        train=C.TrainConfig(ray_batch=1024),
    )
    ds = synthetic.make_dataset(n_views=6, H=40, W=40)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, 300)
    for _ in range(300):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 1024)
    assert float(m["psnr"]) > 20.0, float(m["psnr"])
    # eval path (jitter=False) uses the exact interpolant and should be
    # at least as good
    img = step_lib.render_image(state.params, scene, 40, 40, ds["K"],
                                ds["c2ws"][0], cfg, num_samples=64)
    gt = np.asarray(ds["images"][0])
    psnr = 10 * np.log10(1.0 / np.mean((img - gt) ** 2))
    assert psnr > 20.0, psnr


def test_packed_matches_unpacked_stochastic():
    cfg = HashConfig(num_levels=4, log2_table_size=10, n_min=4, n_max=64,
                     stochastic_train=True, packed=True)
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    key = jax.random.PRNGKey(2)
    plain = np.asarray(he.hash_encode_stochastic(table, x, 0.0, 1.0, cfg,
                                                 key))
    packed = np.asarray(he.hash_encode_stochastic_packed(
        table, x, 0.0, 1.0, cfg, key))
    # identical corners sampled (same key); values bf16-rounded
    np.testing.assert_allclose(packed, plain, atol=2e-3, rtol=2e-2)


def test_packed_gradient_matches():
    cfg = HashConfig(num_levels=3, log2_table_size=8, n_min=4, n_max=32,
                     stochastic_train=True, packed=True)
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    key = jax.random.PRNGKey(2)

    def loss_packed(t):
        return jnp.sum(he.hash_encode_stochastic_packed(
            t, x, 0.0, 1.0, cfg, key) ** 2) * 0.5

    def loss_plain(t):
        return jnp.sum(he.hash_encode_stochastic(
            t, x, 0.0, 1.0, cfg, key) ** 2) * 0.5

    gp = np.asarray(jax.grad(loss_packed)(table))
    gu = np.asarray(jax.grad(loss_plain)(table))
    # same sparsity pattern, values within bf16 tolerance
    np.testing.assert_array_equal(np.abs(gp) > 0, np.abs(gu) > 0)
    np.testing.assert_allclose(gp, gu, atol=2e-3, rtol=5e-2)


def test_packed_end_to_end_training():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=8, log2_table_size=12, n_min=4,
                          n_max=128, stochastic_train=True, packed=True),
        render=C.RenderConfig(num_samples=32),
        train=C.TrainConfig(ray_batch=1024),
    )
    ds = synthetic.make_dataset(n_views=6, H=40, W=40)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, 300)
    for _ in range(300):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 1024)
    assert float(m["psnr"]) > 20.0, float(m["psnr"])


def test_grad_subsample_unbiased_and_converges():
    cfg = HashConfig(num_levels=3, log2_table_size=8, n_min=4, n_max=32,
                     stochastic_train=True, packed=True,
                     grad_subsample=True)
    table = he.init_table(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    def loss(t, key):
        return jnp.sum(he.hash_encode_stochastic_packed(
            t, x, 0.0, 1.0, cfg, key) ** 2) * 0.5

    cfg_full = HashConfig(num_levels=3, log2_table_size=8, n_min=4,
                          n_max=32, stochastic_train=True, packed=True)

    # mean of subsampled grads over many keys ~= full grad (same keys)
    keys = jax.random.split(jax.random.PRNGKey(2), 400)
    gs = jax.vmap(lambda k: jax.grad(
        lambda t: jnp.sum(he.hash_encode_stochastic_packed(
            t, x, 0.0, 1.0, cfg, k) ** 2) * 0.5)(table))(keys)
    gf = jax.vmap(lambda k: jax.grad(
        lambda t: jnp.sum(he.hash_encode_stochastic_packed(
            t, x, 0.0, 1.0, cfg_full, k) ** 2) * 0.5)(table))(keys)
    mean_sub = np.asarray(jnp.mean(gs, axis=0))
    mean_full = np.asarray(jnp.mean(gf, axis=0))
    scale = np.abs(mean_full).max() + 1e-6
    np.testing.assert_allclose(mean_sub / scale, mean_full / scale,
                               atol=0.15)


def test_grad_subsample_end_to_end():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=C.HashConfig(num_levels=8, log2_table_size=12, n_min=4,
                          n_max=128, stochastic_train=True, packed=True,
                          grad_subsample=True),
        render=C.RenderConfig(num_samples=32),
        train=C.TrainConfig(ray_batch=1024),
    )
    ds = synthetic.make_dataset(n_views=6, H=40, W=40)
    scene = trainer_lib.scene_from_dataset(ds, cfg)
    params = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    state, tx = state_lib.create_train_state(params, cfg.train, 300)
    for _ in range(300):
        state, m = step_lib.train_step(state, scene, ds["images"],
                                       ds["c2ws"], ds["K"],
                                       jax.random.PRNGKey(0), cfg, tx, 1024)
    assert float(m["psnr"]) > 20.0, float(m["psnr"])


def test_packed_grad_matches_across_scatter_strategies():
    """Float-packed VJP is identical for all scatter strategies, with
    and without grad_subsample (covers the fused single-sort branch)."""
    x = jax.random.uniform(jax.random.PRNGKey(7), (41, 3))
    key = jax.random.PRNGKey(8)
    grads = {}
    for strat in ("random", "sorted", "segsum"):
        for sub in (False, True):
            cfg = HashConfig(num_levels=3, log2_table_size=8, n_min=4,
                             n_max=32, stochastic_train=True, packed=True,
                             grad_subsample=sub, scatter_strategy=strat)
            table = he.init_table(jax.random.PRNGKey(6), cfg)

            def f(tb):
                out = he.hash_encode_stochastic_packed(
                    tb, x, 0.0, 1.0, cfg, key)
                return jnp.sum(jnp.cos(out * 2.0))

            grads[(strat, sub)] = np.asarray(jax.grad(f)(table))
    for sub in (False, True):
        for strat in ("sorted", "segsum"):
            np.testing.assert_allclose(
                grads[(strat, sub)], grads[("random", sub)],
                rtol=1e-5, atol=1e-6)
