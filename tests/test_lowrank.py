"""CP low-rank factor-line encoder (ops/lowrank.py) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.ops import lowrank as lr
from human_body_reconstruction_tpu.utils.config import HashConfig


def cfg_cp(**kw):
    kw.setdefault("num_levels", 4)
    kw.setdefault("n_min", 4)
    kw.setdefault("n_max", 32)
    kw.setdefault("variant", "cp")
    kw.setdefault("cp_rank", 5)
    kw.setdefault("dense_bf16", False)   # fp32 for exact parity checks
    return HashConfig(**kw)


def test_line_sizes():
    cfg = cfg_cp()
    scales = he.level_scales(cfg)
    assert lr.cp_line_sizes(cfg) == [int(np.floor(s)) + 2 for s in scales]
    cfg2 = cfg_cp(dense_levels=2)
    assert lr.cp_line_sizes(cfg2) == [int(np.floor(s)) + 2
                                      for s in scales[2:]]


def test_out_dim_property():
    assert cfg_cp().out_dim == 4 * 5
    assert cfg_cp(dense_levels=2, features_per_level=2).out_dim == (
        2 * 2 + 2 * 5)


def test_cp_rejects_stochastic_and_packed():
    with pytest.raises(ValueError):
        cfg_cp(stochastic_train=True)
    with pytest.raises(ValueError):
        cfg_cp(packed=True, stochastic_train=True)


def test_cp_encode_matches_reference_gather():
    cfg = cfg_cp()
    lines = lr.init_lines(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (33, 3), minval=0.02,
                           maxval=0.98)
    got = np.asarray(lr.cp_encode(lines, x, 0.0, 1.0, cfg))
    expect = np.asarray(lr.cp_encode_reference(lines, x, 0.0, 1.0, cfg))
    assert got.shape == (33, cfg.out_dim)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-8)


def test_cp_encode_normalised_inputs():
    cfg = cfg_cp()
    lines = lr.init_lines(jax.random.PRNGKey(2), cfg)
    mu = np.array([-1.0, 0.5, 2.0], np.float32)
    sigma = 3.0
    x = mu + sigma * np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (21, 3)))
    got = np.asarray(lr.cp_encode(lines, jnp.asarray(x), mu, sigma, cfg))
    expect = np.asarray(lr.cp_encode_reference(lines, jnp.asarray(x), mu,
                                               sigma, cfg))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-8)


def test_cp_encode_blocked_matches_unblocked():
    cfg = cfg_cp()
    lines = lr.init_lines(jax.random.PRNGKey(4), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2500, 3))
    a = np.asarray(lr.cp_encode(lines, x, 0.0, 1.0, cfg, block=1024))
    b = np.asarray(lr.cp_encode_reference(lines, x, 0.0, 1.0, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_cp_gradients_match_reference():
    """Autodiff through the block-diagonal matmul formulation equals
    autodiff through the direct gather formulation — the backward is
    pure matmul (zero scatters) but must compute the same cotangents."""
    cfg = cfg_cp()
    lines = lr.init_lines(jax.random.PRNGKey(6), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(7), (19, 3), minval=0.05,
                           maxval=0.95)
    w = jax.random.normal(jax.random.PRNGKey(8), (19, cfg.out_dim))

    g_fast = jax.grad(
        lambda ls: jnp.sum(lr.cp_encode(ls, x, 0.0, 1.0, cfg) * w))(lines)
    g_ref = jax.grad(
        lambda ls: jnp.sum(lr.cp_encode_reference(ls, x, 0.0, 1.0, cfg)
                           * w))(lines)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-7)


def test_cp_product_rule_gradient_value():
    """For a single point and rank 1, d(feat)/d(a[x0]) must be
    (1-frac_x) * b(y) * c(z) — the CP product rule."""
    cfg = cfg_cp(num_levels=1, n_min=4, n_max=4, cp_rank=1)
    lines = lr.init_lines(jax.random.PRNGKey(9), cfg)
    x = jnp.asarray([[0.3, 0.55, 0.71]])

    def f(ls):
        return jnp.sum(lr.cp_encode(ls, x, 0.0, 1.0, cfg))

    g = np.asarray(jax.grad(f)(lines)[0])          # (3, G, 1)
    scale = float(he.level_scales(cfg)[0])
    xl = np.array([0.3, 0.55, 0.71]) * scale
    x0 = np.floor(xl).astype(int)
    frac = xl - x0
    ln = np.asarray(lines[0])                       # (3, G, 1)

    def lerp(d):
        return ln[d, x0[d], 0] * (1 - frac[d]) + ln[d, x0[d] + 1, 0] * frac[d]

    # gradient wrt axis-0 line at the floor corner
    np.testing.assert_allclose(g[0, x0[0], 0],
                               (1 - frac[0]) * lerp(1) * lerp(2), rtol=1e-5)
    # two nonzeros per axis
    assert np.count_nonzero(g[0]) == 2
    assert np.count_nonzero(g[1]) == 2
    assert np.count_nonzero(g[2]) == 2


def test_encode_params_cp_with_dense_levels():
    cfg = cfg_cp(dense_levels=2, features_per_level=2)
    enc = he.init_encoder(jax.random.PRNGKey(0), cfg)
    assert "table" not in enc
    assert len(enc["lines"]) == 2 and len(enc["dense"]) == 2
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3))
    out = he.encode_params(enc, x, 0.0, 1.0, cfg)
    assert out.shape == (9, cfg.out_dim)
    from human_body_reconstruction_tpu.ops import dense_grid as dg

    d_only = dg.dense_encode(enc["dense"], x, 0.0, 1.0, cfg)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(d_only),
                               rtol=1e-6)
    c_only = lr.cp_encode(enc["lines"], x, 0.0, 1.0, cfg)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(c_only),
                               rtol=1e-6)


def test_cp_levels_use_shifted_scales():
    """With dense_levels=D the CP lines cover global levels D..L-1."""
    cfg_full = cfg_cp(dense_levels=0)
    cfg_split = cfg_cp(dense_levels=2)
    lines_full = lr.init_lines(jax.random.PRNGKey(7), cfg_full)
    x = jax.random.uniform(jax.random.PRNGKey(8), (13, 3))
    full = np.asarray(lr.cp_encode(lines_full, x, 0.0, 1.0, cfg_full))
    split = np.asarray(lr.cp_encode(lines_full[2:], x, 0.0, 1.0, cfg_split))
    np.testing.assert_allclose(split, full[:, 2 * cfg_full.cp_rank:],
                               rtol=1e-5, atol=1e-8)


def test_cp_end_to_end_train_step_converges():
    """A tiny CP-encoder NeRF optimizes: loss decreases and the factor
    lines receive gradient through render -> composite -> MSE."""
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(
        hash=HashConfig(num_levels=3, n_min=4, n_max=16, variant="cp",
                        cp_rank=4, dense_levels=1, dense_bf16=False),
        render=C.RenderConfig(num_samples=8),
        train=C.TrainConfig(ray_batch=64))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    scene = {"mu": jnp.zeros(3), "sigma": jnp.asarray(8.0),
             "min_bound": jnp.zeros(3), "max_bound": jnp.full((3,), 8.0)}
    lines0 = np.asarray(params["lines"][0])  # snapshot: state is donated
    state, tx = state_lib.create_train_state(params, cfg.train, 30)
    images = jnp.clip(jax.random.uniform(jax.random.PRNGKey(2),
                                         (2, 8, 8, 3)), 0, 1)
    c2ws = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    K = jnp.asarray([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
    losses = []
    for i in range(30):
        state, metrics = step_lib.train_step(
            state, scene, images, c2ws, K, jax.random.PRNGKey(3),
            cfg=cfg, tx=tx, batch_size=cfg.train.ray_batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # lines moved (they get gradient + optimizer updates)
    moved = np.max(np.abs(np.asarray(state.params["lines"][0]) - lines0))
    assert float(moved) > 0


def test_cp_checkpoint_roundtrip(tmp_path):
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.train import checkpoint as ckpt
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(hash=cfg_cp(dense_levels=1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    state, tx = state_lib.create_train_state(params, cfg.train, 10)
    path = str(tmp_path / "cp.npz")
    ckpt.save_train_state(path, state)
    restored = ckpt.load_train_state(path, state)
    for a, b in zip(restored.params["lines"], params["lines"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_cp_restore_and_density_sweep(tmp_path):
    """A CP-trained checkpoint restores through pipeline.restore (config
    json pins variant/rank) and drives the mesh-export density sweep."""
    import os

    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.pipeline import restore as restore_lib
    from human_body_reconstruction_tpu.train import checkpoint as ckpt
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(hash=cfg_cp(dense_levels=1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    state, _ = state_lib.create_train_state(params, cfg.train, 10)
    out = str(tmp_path)
    ckpt.save_train_state(os.path.join(out, "m_ckpt.npz"), state)
    C.to_json(cfg, os.path.join(out, "m_config.json"))
    ckpt.save_bounds(os.path.join(out, "bounds_model.npy"),
                     np.zeros(3), np.full(3, 8.0))

    r = restore_lib.restore(out, "m",
                            bound_pth=os.path.join(out, "bounds_model.npy"))
    assert r.cfg.hash.variant == "cp"
    assert len(r.params["lines"]) == len(params["lines"])
    pts = jnp.asarray(np.random.RandomState(0).uniform(0, 8, (64, 3)),
                      jnp.float32)
    d = nerf.density_only(r.params, r.scene, pts, r.cfg)
    assert np.isfinite(np.asarray(d)).all()


def test_cp_config_json_roundtrip(tmp_path):
    from human_body_reconstruction_tpu.utils import config as C

    cfg = C.PipelineConfig(hash=cfg_cp(cp_rank=7, dense_levels=1))
    p = str(tmp_path / "cfg.json")
    C.to_json(cfg, p)
    back = C.from_json(p)
    assert back.hash.variant == "cp"
    assert back.hash.cp_rank == 7
    assert back.hash.out_dim == cfg.hash.out_dim

def test_cp_tv_loss_matches_numpy_and_trains():
    """cp_tv_weight adds exactly the mean-squared first difference of the
    factor lines (numpy cross-check) and the regularised step still
    optimizes with a finite cp_tv metric."""
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    hcfg = HashConfig(num_levels=3, n_min=4, n_max=16, variant="cp",
                      cp_rank=4, dense_levels=1, dense_bf16=False)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, hcfg),
        "mlp": mlp_lib.init_mlp3d(k2, C.MLPConfig(), hcfg.out_dim,
                                  C.PosEncConfig().out_dim),
    }
    scene = {"mu": jnp.zeros(3), "sigma": jnp.asarray(8.0),
             "min_bound": jnp.zeros(3), "max_bound": jnp.full((3,), 8.0)}
    o = jnp.zeros((16, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
    n = jnp.ones((16,))
    gt = jnp.zeros((16, 3))
    batch = (o, d, n, gt)
    key = jax.random.PRNGKey(1)

    def loss_at(w):
        cfg = C.PipelineConfig(hash=hcfg, render=C.RenderConfig(num_samples=8),
                               train=C.TrainConfig(cp_tv_weight=w))
        return step_lib.loss_fn(params, scene, batch, key, cfg, None, None)

    l0, aux0 = loss_at(0.0)
    l1, aux1 = loss_at(2.0)
    assert "cp_tv" not in aux0
    tv_np = np.mean([np.mean(np.square(np.diff(np.asarray(ln), axis=1)))
                     for ln in params["lines"]])
    np.testing.assert_allclose(float(l1) - float(l0), 2.0 * tv_np,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(aux1["cp_tv"]), tv_np, rtol=1e-5)

    # regularised end-to-end step still trains
    cfg = C.PipelineConfig(hash=hcfg, render=C.RenderConfig(num_samples=8),
                           train=C.TrainConfig(ray_batch=64,
                                               cp_tv_weight=0.1))
    state, tx = state_lib.create_train_state(params, cfg.train, 10)
    images = jnp.clip(jax.random.uniform(jax.random.PRNGKey(2),
                                         (2, 8, 8, 3)), 0, 1)
    c2ws = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    K = jnp.asarray([[10.0, 0, 4.0], [0, 10.0, 4.0], [0, 0, 1]])
    losses = []
    for _ in range(10):
        state, metrics = step_lib.train_step(
            state, scene, images, c2ws, K, jax.random.PRNGKey(3),
            cfg=cfg, tx=tx, batch_size=cfg.train.ray_batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(float(metrics["cp_tv"]))
    assert losses[-1] < losses[0]


def test_sigma_l1_suppresses_fog_and_occ_threshold_plumbs():
    """sigma_l1_weight (TensoRF density L1) lowers off-subject density —
    the occupancy-convergence fix for CP fields (VERDICT r2 item 2) —
    and occ_threshold reaches the trainer's grid."""
    import dataclasses

    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import (state as state_lib,
                                                     step as step_lib)
    from human_body_reconstruction_tpu.utils import config as C

    ds = synthetic.make_dataset(n_views=4, H=32, W=32)
    lo, hi = rays_lib.scene_bounds(32, 32, ds["K"], ds["c2ws"], 2.0, 6.0)
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    fog = {}
    for w in (0.0, 1e-3):
        cfg = C.PipelineConfig(
            hash=C.HashConfig(variant="cp", cp_rank=8, num_levels=4,
                              n_min=4, n_max=64, dense_levels=1),
            render=C.RenderConfig(num_samples=24),
            train=C.TrainConfig(ray_batch=512, sigma_l1_weight=w))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {**he.init_encoder(k1, cfg.hash),
                  "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                            cfg.dir_enc.out_dim)}
        state, tx = state_lib.create_train_state(params, cfg.train, 100)
        for _ in range(100):
            state, m = step_lib.train_step(
                state, scene, ds["images"], ds["c2ws"], ds["K"],
                jax.random.PRNGKey(0), cfg, tx, 512)
        if w > 0:
            assert np.isfinite(float(m["sigma_l1"]))
        pts = (jax.random.uniform(jax.random.PRNGKey(5), (4096, 3)) * 3.0
               + jnp.asarray([0.0, 0.0, 1.5]))
        d = nerf.density_only(state.params, scene, pts, cfg)
        fog[w] = float(jnp.mean(jnp.maximum(d, 0.0)))
    assert fog[1e-3] < fog[0.0], fog

    # occ_threshold flows CLI -> RenderConfig -> the trainer's grid
    from human_body_reconstruction_tpu.cli import train_hash
    args = train_hash.build_parser().parse_args(
        ["--occupancy", "--occ_threshold", "0.5", "--sigma_l1", "1e-4"])
    cfg = train_hash.make_config(args)
    assert cfg.render.occ_threshold == 0.5
    assert cfg.train.sigma_l1_weight == 1e-4
    from human_body_reconstruction_tpu.ops import occupancy
    g = occupancy.init_grid(8, threshold=cfg.render.occ_threshold)
    assert float(g.threshold) == 0.5


def test_cp_tv_rejects_non_cp_variant():
    """--cp_tv with a hash-table variant would be silently ignored by
    loss_fn (it guards on 'lines' in params); the config rejects it at
    construction instead (ADVICE r2)."""
    from human_body_reconstruction_tpu.utils import config as C

    with pytest.raises(ValueError, match="cp_tv"):
        C.PipelineConfig(train=C.TrainConfig(cp_tv_weight=0.1))
    with pytest.raises(ValueError, match="cp_tv"):
        C.PipelineConfig(hash=HashConfig(variant="cell"),
                         train=C.TrainConfig(cp_tv_weight=0.1))
    # and the valid combination still constructs
    C.PipelineConfig(hash=cfg_cp(), train=C.TrainConfig(cp_tv_weight=0.1))


def test_cp_tv_warmup_gates_the_penalty_by_step():
    """cp_tv_warmup > 0: the TV term contributes ZERO loss before the
    warmup step and the full weighted term after (the humanoid-collapse
    fix: TV must not flatten the field the occupancy warmup refresh
    reads — qm_r3_humanoid3.json)."""
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    hcfg = HashConfig(num_levels=3, n_min=4, n_max=16, variant="cp",
                      cp_rank=4, dense_levels=1, dense_bf16=False)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, hcfg),
        "mlp": mlp_lib.init_mlp3d(k2, C.MLPConfig(), hcfg.out_dim,
                                  C.PosEncConfig().out_dim),
    }
    scene = {"mu": jnp.zeros(3), "sigma": jnp.asarray(8.0),
             "min_bound": jnp.zeros(3), "max_bound": jnp.full((3,), 8.0)}
    batch = (jnp.zeros((16, 3)),
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1)),
             jnp.ones((16,)), jnp.zeros((16, 3)))
    key = jax.random.PRNGKey(1)

    def loss_at(w, warmup, step):
        cfg = C.PipelineConfig(
            hash=hcfg, render=C.RenderConfig(num_samples=8),
            train=C.TrainConfig(cp_tv_weight=w, cp_tv_warmup=warmup))
        return step_lib.loss_fn(params, scene, batch, key, cfg, None,
                                None, step=jnp.asarray(step))

    l_off, _ = loss_at(0.0, 0, 0)
    l_pre, aux_pre = loss_at(2.0, 100, 99)
    l_post, aux_post = loss_at(2.0, 100, 100)
    l_nowarm, _ = loss_at(2.0, 0, 0)
    # before warmup: weighted term absent from the loss (metric stays)
    np.testing.assert_allclose(float(l_pre), float(l_off), rtol=1e-6)
    assert float(aux_pre["cp_tv"]) > 0.0
    # at/after warmup: identical to the no-warmup loss
    np.testing.assert_allclose(float(l_post), float(l_nowarm), rtol=1e-6)
    assert float(l_post) > float(l_pre)
