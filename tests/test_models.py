"""Model head tests: shapes, activations, parameter counts."""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.models import mlp
from human_body_reconstruction_tpu.utils.config import ClassicNeRFConfig, MLPConfig


def test_mlp3d_shapes_and_ranges():
    cfg = MLPConfig()
    in_dim, d_view = 32, 24
    params = mlp.init_mlp3d(jax.random.PRNGKey(0), cfg, in_dim, d_view)
    feats = jax.random.normal(jax.random.PRNGKey(1), (128, in_dim))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (128, d_view))
    rgb, density = mlp.apply_mlp3d(params, feats, dirs, cfg)
    assert rgb.shape == (128, 3) and density.shape == (128,)
    # sigmoid rgb in (0, 1)
    assert np.all(np.asarray(rgb) > 0) and np.all(np.asarray(rgb) < 1)


def test_mlp3d_structure_matches_reference():
    """num_sig=2: density branch has 3 linear layers ending at 1+15;
    num_col=2: colour branch has 3 layers ending at 3
    (reference test_hash.py:24-50 with the train_hash2.py:127 settings)."""
    cfg = MLPConfig(num_sig=2, num_col=2, geo_feat_dim=15)
    params = mlp.init_mlp3d(jax.random.PRNGKey(0), cfg, 32, 24)
    assert len(params["sig"]) == 3
    assert params["sig"][0]["w"].shape == (32, 64)
    assert params["sig"][-1]["w"].shape == (64, 16)
    assert len(params["col"]) == 3
    assert params["col"][0]["w"].shape == (15 + 24, 64)
    assert params["col"][-1]["w"].shape == (64, 3)


def test_mlp3d_elu_parity_mode():
    cfg = MLPConfig(rgb_activation="elu")
    params = mlp.init_mlp3d(jax.random.PRNGKey(0), cfg, 32, 24)
    feats = jax.random.normal(jax.random.PRNGKey(1), (64, 32)) * 3
    dirs = jax.random.normal(jax.random.PRNGKey(2), (64, 24))
    rgb, _ = mlp.apply_mlp3d(params, feats, dirs, cfg)
    # ELU range is (-1, inf)
    assert np.all(np.asarray(rgb) > -1)


def test_mlp3d_sdf_density_bounded():
    cfg = MLPConfig(density_activation="sdf")
    params = mlp.init_mlp3d(jax.random.PRNGKey(0), cfg, 32, 24)
    feats = jax.random.normal(jax.random.PRNGKey(1), (64, 32)) * 5
    raw, _ = mlp.mlp3d_density(params, feats, cfg)
    d = mlp.apply_density_activation(raw, cfg)
    dn = np.asarray(d)
    assert np.all(dn > -1) and np.all(dn < 1)  # 2*sigmoid-1


def test_mlp3d_bf16_compute_close_to_fp32():
    cfg = MLPConfig()
    params = mlp.init_mlp3d(jax.random.PRNGKey(0), cfg, 32, 24)
    feats = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (64, 24))
    rgb32, d32 = mlp.apply_mlp3d(params, feats, dirs, cfg)
    rgb16, d16 = mlp.apply_mlp3d(params, feats, dirs, cfg,
                                 compute_dtype=jnp.bfloat16)
    assert np.max(np.abs(np.asarray(rgb32) - np.asarray(rgb16))) < 0.05


def test_classic_nerf_shapes():
    cfg = ClassicNeRFConfig(d_input=60, d_viewdirs=60)
    params = mlp.init_classic_nerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 60))
    v = jax.random.normal(jax.random.PRNGKey(2), (32, 60))
    rgb, alpha = mlp.apply_classic_nerf(params, x, cfg, viewdirs=v)
    assert rgb.shape == (32, 3) and alpha.shape == (32,)
    a = np.asarray(alpha)
    assert np.all(a > 0) and np.all(a < 1)  # sigmoid alpha
    assert np.all(np.asarray(rgb) >= 0)     # relu rgb


def test_classic_nerf_no_viewdirs():
    cfg = ClassicNeRFConfig(d_input=60, d_viewdirs=None)
    params = mlp.init_classic_nerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 60))
    rgb, alpha = mlp.apply_classic_nerf(params, x, cfg)
    assert rgb.shape == (8, 3) and alpha.shape == (8,)


def test_classic_nerf_skip_layer_dims():
    cfg = ClassicNeRFConfig(d_input=60, n_layers=8, d_filter=256, skip=(4,))
    params = mlp.init_classic_nerf(jax.random.PRNGKey(0), cfg)
    # layer 5 (index into layers list) takes the skip concat
    assert params["layers"][5]["w"].shape == (256 + 60, 256)
    assert params["layers"][4]["w"].shape == (256, 256)


def test_mlp2d():
    params = mlp.init_mlp2d(jax.random.PRNGKey(0), in_dim=32)
    y = mlp.apply_mlp2d(params, jax.random.normal(jax.random.PRNGKey(1), (10, 32)))
    assert y.shape == (10, 3)
    assert np.all(np.asarray(y) >= 0)  # relu output (ref test_hash.py:17)


def test_var_model_init():
    p = mlp.init_var_model()
    assert float(p["b"]) == 0.5
