"""Pallas CP two-hot matmul kernel (ops/cp_pallas.py) vs the XLA path.

Off-TPU the kernel runs in interpreter mode (cp_encode_pallas flips it
automatically), so these tests exercise the exact kernel logic — block
specs, scratch writes, accumulation grid — without a chip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_body_reconstruction_tpu.ops import cp_pallas, lowrank
from human_body_reconstruction_tpu.utils import config as C


def cfg_cp(**kw):
    base = dict(num_levels=6, n_min=16, n_max=256, variant="cp",
                cp_rank=16, dense_levels=2, cp_impl="xla")
    base.update(kw)
    return C.HashConfig(**base)


def make_inputs(cfg, n=777, seed=0):
    lines = lowrank.init_lines(jax.random.PRNGKey(seed), cfg)
    # includes out-of-bounds points to exercise the clamping path
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3)) * 2.0 - 0.5
    return lines, x, jnp.zeros(3), jnp.float32(1.0)


def test_padded_layout_alignment():
    offs, padded, total = cp_pallas.padded_layout([66, 130, 258])
    assert padded == [128, 256, 384]
    assert offs == [0, 128, 384]
    assert total == 768
    for o in offs:
        assert o % 128 == 0


def test_forward_matches_xla_path():
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg)
    ref = lowrank.cp_encode(lines, x, mu, sigma, cfg)
    out = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=256)
    assert out.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_forward_matches_reference_gather():
    """Against the independent direct-gather implementation, not just
    the production XLA path."""
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=257)
    ref = lowrank.cp_encode_reference(lines, x, mu, sigma, cfg)
    out = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=256)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_gradients_match_xla_path():
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=500)

    def loss(fn):
        return lambda l: jnp.sum(jnp.sin(fn(l, x, mu, sigma, cfg)))

    gr = jax.grad(loss(lowrank.cp_encode))(lines)
    gp = jax.grad(loss(lambda *a, **k: cp_pallas.cp_encode_pallas(
        *a, block=256, **k)))(lines)
    for a, b in zip(gr, gp):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2


def test_gradients_match_xla_path_rank48_column_split():
    """Flagship-scale levels at rank 48 engage the column-split backward
    (n_cb > 1): the full-width dM block + its contrib intermediate
    measure 16.61 MB on hardware, over Mosaic's 16 MB scoped-VMEM stack,
    so _pallas_calls tiles the dM columns.  Gradients must still match
    the XLA path exactly up to bf16 rounding."""
    cfg = cfg_cp(num_levels=8, n_max=2048, cp_rank=48)
    sizes = tuple(lowrank.cp_line_sizes(cfg))
    _, _, total = cp_pallas.padded_layout(sizes)
    c_pad = ((len(sizes) * 48 + 127) // 128) * 128
    # precondition: this layout actually exceeds the split threshold
    assert 512 * total * 2 + 2 * total * c_pad * 4 + 512 * c_pad * 4 > 15.5e6
    lines, x, mu, sigma = make_inputs(cfg, n=500)

    def loss(fn):
        return lambda l: jnp.sum(jnp.sin(fn(l, x, mu, sigma, cfg)))

    gr = jax.grad(loss(lowrank.cp_encode))(lines)
    gp = jax.grad(loss(lambda *a, **k: cp_pallas.cp_encode_pallas(
        *a, **k)))(lines)
    for a, b in zip(gr, gp):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2


def test_no_position_gradient():
    """Fractions are stop_gradient'ed in both paths: the encode output
    must carry no gradient to the input points."""
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=64)
    g = jax.grad(lambda xx: jnp.sum(cp_pallas.cp_encode_pallas(
        lines, xx, mu, sigma, cfg, block=64)))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_cfg_routing():
    """cp_impl='pallas' routes cp_encode through the kernel; 'xla' does
    not; both agree numerically."""
    cfg_x = cfg_cp(cp_impl="xla")
    cfg_p = cfg_cp(cp_impl="pallas")
    lines, x, mu, sigma = make_inputs(cfg_x, n=300)
    a = lowrank.cp_encode(lines, x, mu, sigma, cfg_x)
    b = lowrank.cp_encode(lines, x, mu, sigma, cfg_p)
    scale = float(jnp.max(jnp.abs(a))) + 1e-9
    assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2


def test_rank_slice_shapes():
    """Rank-parallel chips call with an R/n slice of every level's
    lines; the kernel must honour the slice rank, not cfg.cp_rank."""
    cfg = cfg_cp(cp_rank=16)
    lines, x, mu, sigma = make_inputs(cfg, n=130)
    half = tuple(ln[..., :8] for ln in lines)
    out = cp_pallas.cp_encode_pallas(half, x, mu, sigma, cfg, block=128)
    assert out.shape == (130, len(lines) * 8)
    ref = lowrank.cp_encode(half, x, mu, sigma, cfg)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-9
    assert float(jnp.max(jnp.abs(ref - out))) / scale < 2e-2


def test_chunked_matches_single_chunk():
    """Above the chunk cap the encode runs as a rematerialised lax.map
    over point chunks; values and gradients must match the single-chunk
    path exactly (the chunking is pure reassociation)."""
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=1500)
    a = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=128,
                                   block_bwd=128)
    b = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=128,
                                   block_bwd=128, chunk=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def loss(fn):
        return lambda l: jnp.sum(jnp.sin(fn(l)))

    ga = jax.grad(loss(lambda l: cp_pallas.cp_encode_pallas(
        l, x, mu, sigma, cfg, block=128, block_bwd=128)))(lines)
    gb = jax.grad(loss(lambda l: cp_pallas.cp_encode_pallas(
        l, x, mu, sigma, cfg, block=128, block_bwd=128, chunk=512)))(lines)
    for p, q in zip(ga, gb):
        # the dM cotangent is bf16 (it matches the bf16 factor-matrix
        # primal), so per-chunk accumulation re-rounds: bf16 tolerance
        scale = float(jnp.max(jnp.abs(p))) + 1e-9
        assert float(jnp.max(jnp.abs(p - q))) / scale < 2e-2


def test_block_padding_invariance():
    """Results must not depend on the point-block size (padding rows
    are sliced off; their cotangents are zero)."""
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=129)
    a = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=128)
    b = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_tight_layout_packing():
    # 2^k+2 sizes (the flagship ladder): 8-aligned tight rows, total
    # padded to 128 — 4736 -> 4096 executed rows at the real ladder
    offs, aligned, total = cp_pallas.tight_layout([66, 130, 258])
    assert aligned == [72, 136, 264]
    assert offs == [0, 72, 208]
    assert total == 512          # 472 -> 512
    offs, _, total = cp_pallas.tight_layout([66, 130, 258, 514, 1026, 2050])
    assert total == 4096         # vs padded_layout's 4736


def test_block_coverage():
    sizes = [66, 130]
    offs, _, total = cp_pallas.tight_layout(sizes)      # offs [0, 72]
    cov = cp_pallas._block_coverage(sizes, offs, total)
    assert len(cov) == total // 128
    # block 0 ([0,128)): level 0 rows [0,66) and level 1 rows [72,202)
    assert cov[0] == ((0, 0), (1, 72))
    # block 1 ([128,256)): only level 1
    assert cov[1] == ((1, 72),)


@pytest.mark.parametrize("fwd_db", [False, True])
def test_tight_layout_bit_identical_to_padded(fwd_db):
    """Tight packing must be semantics-preserving: a level's hat rows
    are zero outside its own segment, so only the dot's FMA grouping
    (which K-block the two nonzero terms of a two-hot row land in) can
    differ — tolerance at the f32-epsilon scale of the ~1e-3 outputs,
    1000x tighter than the bf16 tolerance vs the XLA path."""
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=513)
    a = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=256,
                                   layout="padded", fwd_db=fwd_db)
    b = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg, block=256,
                                   layout="tight", fwd_db=fwd_db)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=0)


def test_tight_layout_gradient_matches_padded():
    cfg = cfg_cp()
    lines, x, mu, sigma = make_inputs(cfg, n=384)

    def loss(lines, layout):
        out = cp_pallas.cp_encode_pallas(lines, x, mu, sigma, cfg,
                                         block=128, layout=layout)
        return jnp.sum(out * out)

    ga = jax.grad(lambda l: loss(l, "padded"))(lines)
    gb = jax.grad(lambda l: loss(l, "tight"))(lines)
    # dM is emitted in bf16 (_cp_matmul_bwd): an f32 accumulation that
    # lands near a bf16 rounding boundary can flip one ulp when the FMA
    # grouping changes with the layout width — tolerance one bf16 ulp
    # of the max-magnitude entry
    for a, b in zip(ga, gb):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-3,
                                   rtol=0)
