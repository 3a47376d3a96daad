"""Dense coarse-level encoding (MXU tensor-product trilerp) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.ops import dense_grid as dg
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.utils.config import HashConfig


def cfg_dense(**kw):
    kw.setdefault("num_levels", 4)
    kw.setdefault("log2_table_size", 8)
    kw.setdefault("n_min", 4)
    kw.setdefault("n_max", 32)
    kw.setdefault("dense_levels", 2)
    kw.setdefault("dense_bf16", False)   # fp32 for exact parity checks
    return HashConfig(**kw)


def numpy_dense_encode(grids, x, mu, sigma, cfg):
    """Independent loop trilerp over the dense grids."""
    scales = he.level_scales(cfg)
    F = cfg.features_per_level
    D = cfg.dense_levels
    out = np.zeros((x.shape[0], D * F))
    xn = (np.asarray(x, np.float64) - mu) / sigma
    for n in range(x.shape[0]):
        for l in range(D):
            g = np.asarray(grids[l], np.float64)
            G = g.shape[0]
            xl = xn[n] * scales[l]
            x0 = np.clip(np.floor(xl).astype(np.int64), 0, G - 2)
            frac = np.clip(xl - x0, 0.0, 1.0)
            for c in range(8):
                offs = np.array([(c >> d) & 1 for d in range(3)])
                w = 1.0
                for d in range(3):
                    w *= frac[d] if offs[d] else (1 - frac[d])
                idx = x0 + offs
                out[n, l * F:(l + 1) * F] += w * g[idx[0], idx[1], idx[2]]
    return out


def test_grid_sizes():
    cfg = cfg_dense()
    sizes = dg.dense_grid_sizes(cfg)
    scales = he.level_scales(cfg)
    assert sizes == [int(np.floor(scales[0])) + 2,
                     int(np.floor(scales[1])) + 2]


def test_dense_encode_matches_numpy():
    cfg = cfg_dense()
    grids = dg.init_dense(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=0.02,
                           maxval=0.98)
    got = np.asarray(dg.dense_encode(grids, x, 0.0, 1.0, cfg))
    expect = numpy_dense_encode(grids, np.asarray(x), 0.0, 1.0, cfg)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-9)


def test_dense_encode_normalised():
    cfg = cfg_dense()
    grids = dg.init_dense(jax.random.PRNGKey(2), cfg)
    mu = np.array([-1.0, 0.5, 2.0], np.float32)
    sigma = 3.0
    x = mu + sigma * np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (11, 3)))
    got = np.asarray(dg.dense_encode(grids, jnp.asarray(x), mu, sigma, cfg))
    expect = numpy_dense_encode(grids, x, mu, sigma, cfg)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-9)


def test_dense_encode_blocked_matches_unblocked():
    cfg = cfg_dense()
    grids = dg.init_dense(jax.random.PRNGKey(4), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (700, 3))
    a = np.asarray(dg.dense_encode(grids, x, 0.0, 1.0, cfg, block=256))
    b = np.asarray(dg.dense_encode(grids, x, 0.0, 1.0, cfg, block=0))
    # differing block sizes reassociate the matmul reduction; values are
    # O(init_scale) so a tiny atol absorbs the noise
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-9)


def test_dense_grad_is_trilinear_weights():
    """d(sum of features)/d(grid) puts exactly the trilinear weights at
    the 8 corners of each point's cell — the collision-free analogue of
    the hash-table gradient, with NO scatter in the computation."""
    cfg = cfg_dense(dense_levels=1, num_levels=2)
    grids = dg.init_dense(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray([[0.3, 0.55, 0.71]])

    def f(gs):
        return jnp.sum(dg.dense_encode(gs, x, 0.0, 1.0, cfg))

    grad = jax.grad(f)(grids)[0]              # (G, G, G, F)
    # both features of a corner receive the same weight (sum over F)
    np.testing.assert_allclose(np.asarray(grad[..., 0]),
                               np.asarray(grad[..., 1]), rtol=1e-6)
    w = np.asarray(grad[..., 0])
    assert np.count_nonzero(w) == 8
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    # weight at the floor corner is prod(1 - frac)
    scale = he.level_scales(cfg)[0]
    xl = np.array([0.3, 0.55, 0.71]) * scale
    x0 = np.floor(xl).astype(int)
    frac = xl - x0
    np.testing.assert_allclose(w[x0[0], x0[1], x0[2]],
                               np.prod(1 - frac), rtol=1e-5)


def test_auto_dense_levels_monotone():
    cfg = HashConfig(num_levels=16, n_min=16, n_max=2048)
    d = dg.auto_dense_levels(cfg)
    assert 2 <= d <= 8
    sizes = [dg.grid_size(float(s)) for s in he.level_scales(cfg)[:d]]
    assert all(g <= 64 for g in sizes)


def test_encode_params_concatenates_dense_first():
    cfg = cfg_dense()
    enc = he.init_encoder(jax.random.PRNGKey(0), cfg)
    assert enc["table"].shape[0] == cfg.num_hashed_levels == 2
    assert len(enc["dense"]) == 2
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3))
    out = he.encode_params(enc, x, 0.0, 1.0, cfg)
    assert out.shape == (9, cfg.num_levels * cfg.features_per_level)
    # dense features occupy the leading D*F columns
    d_only = dg.dense_encode(enc["dense"], x, 0.0, 1.0, cfg)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(d_only),
                               rtol=1e-6)
    h_only = he.hash_encode(enc["table"], x, 0.0, 1.0, cfg)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(h_only),
                               rtol=1e-6)


def test_hashed_levels_use_shifted_scales():
    """With dense_levels=D, the hashed table's level l corresponds to
    global level D+l (the scales ladder is sliced, not restarted)."""
    cfg_full = cfg_dense(dense_levels=0)
    cfg_split = cfg_dense(dense_levels=2)
    table_full = he.init_table(jax.random.PRNGKey(7), cfg_full)
    x = jax.random.uniform(jax.random.PRNGKey(8), (13, 3))
    full = np.asarray(he.hash_encode(table_full, x, 0.0, 1.0, cfg_full))
    split = np.asarray(he.hash_encode(table_full[2:], x, 0.0, 1.0,
                                      cfg_split))
    np.testing.assert_allclose(split, full[:, 4:], rtol=1e-6)


def test_end_to_end_render_with_dense_levels():
    """Full render + grad step through the mixed dense+hashed encoder."""
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=HashConfig(num_levels=4, log2_table_size=8, n_min=4, n_max=32,
                        dense_levels=2, dense_bf16=False),
        render=C.RenderConfig(num_samples=8))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    scene = {"mu": jnp.zeros(3), "sigma": jnp.asarray(8.0),
             "min_bound": jnp.zeros(3), "max_bound": jnp.full((3,), 8.0)}
    B = 16
    rays_o = jnp.zeros((B, 3))
    d = jax.random.normal(jax.random.PRNGKey(3), (B, 3)) + jnp.asarray(
        [0.0, 0.0, -3.0])
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)

    def loss(p):
        out = nerf.render_rays(p, scene, rays_o, d / dn, dn,
                               jax.random.PRNGKey(4), cfg)
        return jnp.mean(out["fine"] ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gd = grads["dense"][0]
    assert np.isfinite(np.asarray(gd)).all()
    # dense grids actually receive gradient
    assert float(jnp.max(jnp.abs(gd))) > 0


def test_train_state_and_checkpoint_with_dense(tmp_path):
    """Dense grids ride the optimizer + checkpoint round-trip."""
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.train import checkpoint as ckpt
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=HashConfig(num_levels=4, log2_table_size=8, n_min=4, n_max=32,
                        dense_levels=2))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    state, tx = state_lib.create_train_state(params, cfg.train, 10)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    import optax

    new_params = optax.apply_updates(state.params, updates)
    assert float(jnp.max(jnp.abs(new_params["dense"][0]
                                 - params["dense"][0]))) > 0

    path = str(tmp_path / "ck.npz")
    state2 = state._replace(params=new_params, opt_state=opt_state)
    ckpt.save_train_state(path, state2)
    restored = ckpt.load_train_state(path, state)
    np.testing.assert_allclose(np.asarray(restored.params["dense"][1]),
                               np.asarray(new_params["dense"][1]))
