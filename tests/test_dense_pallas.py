"""Pallas dense-level kernel (ops/dense_pallas.py) vs the XLA path.

Off-TPU the kernel runs in interpreter mode (dense_encode_pallas flips
it automatically), so these tests exercise the exact kernel logic —
block-diagonal layout, VMEM pair-weight rebuild, in-kernel third-axis
fold, backward accumulation grid — without a chip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from human_body_reconstruction_tpu.ops import dense_grid, dense_pallas
from human_body_reconstruction_tpu.ops import hash_encoding as H
from human_body_reconstruction_tpu.utils import config as C


def cfg_dense(**kw):
    base = dict(num_levels=6, n_min=16, n_max=256, dense_levels=2,
                features_per_level=2)
    base.update(kw)
    return C.HashConfig(**base)


def make_inputs(cfg, n=333, seed=0):
    grids = dense_grid.init_dense(jax.random.PRNGKey(seed), cfg)
    # out-of-bounds points exercise the clamping path
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3)) * 2.0 - 0.5
    return grids, x, jnp.zeros(3), jnp.float32(1.0)


def test_layout_alignment():
    row_offs, col_offs, rows_pad, c_pad = dense_pallas.dense_layout(
        [17, 33], 2)
    # 17^2=289 -> 296 (8-aligned), 33^2=1089 -> 1096; total -> 128-mult
    assert row_offs == [0, 296]
    assert rows_pad % 128 == 0 and rows_pad >= 296 + 1089
    assert col_offs == [0, 34]
    assert c_pad == 128
    assert c_pad >= 34 + 66


def test_fold_matrix_partitions_columns():
    g_sizes, f = [17, 33], 2
    _, col_offs, _, c_pad = dense_pallas.dense_layout(g_sizes, f)
    s = dense_pallas._fold_matrix(g_sizes, f, c_pad)
    # every valid column folds into exactly one output column, in the
    # right level block
    for l, g in enumerate(g_sizes):
        block = s[col_offs[l]:col_offs[l] + g * f]
        assert block.sum() == g * f
        assert set(np.nonzero(block)[1]) <= {l * f, l * f + 1}
    # padding columns fold nowhere
    used = sum(g * f for g in g_sizes)
    assert s.sum() == used


def test_forward_matches_xla_path():
    cfg = cfg_dense()
    grids, x, mu, sigma = make_inputs(cfg)
    ref = dense_grid.dense_encode(grids, x, mu, sigma, cfg)
    out = dense_pallas.dense_encode_pallas(grids, x, mu, sigma, cfg,
                                           block=256)
    assert out.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_forward_matches_f32_reference():
    """Against the fp32 XLA path (exact trilerp, no bf16 rounding)."""
    cfg = cfg_dense(dense_bf16=False)
    grids, x, mu, sigma = make_inputs(cfg, n=257)
    ref = dense_grid.dense_encode(grids, x, mu, sigma, cfg)
    out = dense_pallas.dense_encode_pallas(grids, x, mu, sigma, cfg,
                                           block=256)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    # kernel is bf16 internally -> bf16-level agreement vs f32 oracle
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_three_levels_odd_batch():
    cfg = cfg_dense(dense_levels=3, num_levels=8)
    grids, x, mu, sigma = make_inputs(cfg, n=1021, seed=3)
    ref = dense_grid.dense_encode(grids, x, mu, sigma, cfg)
    out = dense_pallas.dense_encode_pallas(grids, x, mu, sigma, cfg,
                                           block=256, block_bwd=512)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_grad_matches_xla_path():
    cfg = cfg_dense()
    grids, x, mu, sigma = make_inputs(cfg, n=301, seed=5)
    key = jax.random.PRNGKey(7)

    def loss(fn):
        def f(grids):
            out = fn(grids, x, mu, sigma, cfg)
            w = jax.random.normal(key, out.shape)
            return jnp.sum(out * w)
        return f

    g_ref = jax.grad(loss(dense_grid.dense_encode))(grids)
    g_out = jax.grad(loss(
        lambda *a, **k: dense_pallas.dense_encode_pallas(
            *a, block=256, **k)))(grids)
    for gr, go in zip(g_ref, g_out):
        assert go.shape == gr.shape
        scale = float(jnp.max(jnp.abs(gr))) + 1e-9
        assert float(jnp.max(jnp.abs(gr - go))) / scale < 3e-2


def test_no_position_grad():
    cfg = cfg_dense()
    grids, x, mu, sigma = make_inputs(cfg, n=65, seed=9)
    g = jax.grad(lambda x: jnp.sum(dense_pallas.dense_encode_pallas(
        grids, x, mu, sigma, cfg, block=64) ** 2))(x)
    # fractions are stop_gradient'ed (parity with the XLA path /
    # reference hash_encoding.py:160 diff.detach())
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_encode_params_dispatch():
    """cfg.dense_impl='pallas' routes encode_params through the kernel
    and the full feature vector still matches the XLA route."""
    cfg = cfg_dense(variant="cp", cp_rank=4, cp_impl="xla")
    key = jax.random.PRNGKey(11)
    enc = H.init_encoder(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(12), (97, 3))
    mu, sigma = jnp.zeros(3), jnp.float32(1.0)
    ref = H.encode_params(enc, x, mu, sigma, cfg)
    out = H.encode_params(
        enc, x, mu, sigma, dataclasses.replace(cfg, dense_impl="pallas"))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2
