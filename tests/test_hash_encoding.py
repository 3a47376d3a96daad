"""Hash-encoder unit tests: hash values, interpolation, gradients.

Pure-python/numpy references implement the same math independently
(SURVEY.md section 4: "hash function vs known XOR values; trilerp vs
scipy-style reference").
"""

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.utils.config import HashConfig

PRIMES = he.PRIMES


def numpy_hash(coords, T):
    """uint32-wraparound XOR hash, independent implementation."""
    coords = np.asarray(coords, dtype=np.uint64)
    acc = (coords[..., 0] * PRIMES[0]) & 0xFFFFFFFF
    for d in range(1, coords.shape[-1]):
        acc = acc ^ ((coords[..., d] * PRIMES[d]) & 0xFFFFFFFF)
    return (acc % T).astype(np.int64)


def test_hash_known_values():
    T = 2 ** 16
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                       [123, 456, 789], [65535, 1, 2]], np.uint32)
    got = np.asarray(he.hash_corner_indices(jnp.asarray(coords), T))
    expect = numpy_hash(coords, T)
    np.testing.assert_array_equal(got.astype(np.int64), expect)
    # hand-check one value
    v = (123 * 1) ^ ((456 * 2654435761) & 0xFFFFFFFF) ^ ((789 * 805459861) & 0xFFFFFFFF)
    assert got[4] == v % T


def test_hash_2d():
    T = 2 ** 10
    coords = np.array([[3, 7], [100, 200]], np.uint32)
    got = np.asarray(he.hash_corner_indices(jnp.asarray(coords), T))
    expect = numpy_hash(coords, T)
    np.testing.assert_array_equal(got.astype(np.int64), expect)


def numpy_hash_encode(table, x, mu, sigma, cfg):
    """Slow, loop-based independent reimplementation of the encoder."""
    L, T, F = table.shape
    scales = he.level_scales(cfg)
    N = x.shape[0]
    out = np.zeros((N, L * F), np.float64)
    xn = (np.asarray(x, np.float64) - mu) / sigma
    for n in range(N):
        for l in range(L):
            xl = xn[n] * scales[l]
            x0 = np.floor(xl).astype(np.int64)
            frac = xl - x0
            acc = np.zeros(F)
            for c in range(2 ** cfg.dim):
                offs = [(c >> d) & 1 for d in range(cfg.dim)]
                corner = (x0 + offs).astype(np.uint32)
                idx = numpy_hash(corner[None], T)[0]
                w = 1.0
                for d in range(cfg.dim):
                    w *= frac[d] if offs[d] else (1 - frac[d])
                acc += w * np.asarray(table[l, idx], np.float64)
            out[n, l * F:(l + 1) * F] = acc
    return out


def test_encode_matches_numpy_reference_3d():
    cfg = HashConfig(num_levels=4, features_per_level=2, log2_table_size=8,
                     n_min=4, n_max=32, dim=3)
    key = jax.random.PRNGKey(0)
    table = he.init_table(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-1, maxval=2)
    got = np.asarray(he.hash_encode(table, x, 0.0, 1.0, cfg))
    expect = numpy_hash_encode(np.asarray(table), np.asarray(x), 0.0, 1.0, cfg)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_encode_matches_numpy_reference_2d_with_norm():
    cfg = HashConfig(num_levels=3, features_per_level=4, log2_table_size=10,
                     n_min=16, n_max=256, dim=2)
    table = he.init_table(jax.random.PRNGKey(2), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (9, 2), minval=0, maxval=500)
    mu, sigma = 0.0, 500.0
    got = np.asarray(he.hash_encode(table, x, mu, sigma, cfg))
    expect = numpy_hash_encode(np.asarray(table), np.asarray(x), mu, sigma, cfg)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_encode_exact_on_lattice_points():
    """At integer lattice coords the encoding equals the table entry of
    that corner (all interpolation weight on one corner)."""
    cfg = HashConfig(num_levels=1, features_per_level=2, log2_table_size=6,
                     n_min=8, n_max=8, dim=3)
    table = he.init_table(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray([[0.5, 0.25, 0.125]])  # *8 -> (4, 2, 1): exact lattice
    got = np.asarray(he.hash_encode(table, x, 0.0, 1.0, cfg))[0]
    idx = numpy_hash(np.array([[4, 2, 1]], np.uint32), cfg.table_size)[0]
    np.testing.assert_allclose(got, np.asarray(table)[0, idx], rtol=1e-5)


def test_encode_gradient_flows_to_table_only_touched_rows():
    cfg = HashConfig(num_levels=2, features_per_level=2, log2_table_size=8,
                     n_min=4, n_max=16, dim=3)
    table = he.init_table(jax.random.PRNGKey(5), cfg)
    x = jnp.asarray([[0.3, 0.4, 0.5]])

    def loss(tb):
        return jnp.sum(he.hash_encode(tb, x, 0.0, 1.0, cfg))

    g = jax.grad(loss)(table)
    gn = np.asarray(g)
    # at most 8 corners touched per level
    touched = (np.abs(gn).sum(-1) > 0).sum(axis=-1)
    assert np.all(touched <= 8) and np.all(touched >= 1)
    # interpolation weights per level sum to 1 -> per-level grad mass == 1 per feature
    np.testing.assert_allclose(gn.sum(axis=1), np.ones((2, 2)), rtol=1e-5)


def test_encode_no_gradient_to_positions_fracs():
    """frac is stop_gradient'ed (reference detaches diff,
    hash_encoding.py:160): d(encode)/dx must be zero."""
    cfg = HashConfig(num_levels=2, features_per_level=2, log2_table_size=8,
                     n_min=4, n_max=16, dim=3)
    table = he.init_table(jax.random.PRNGKey(6), cfg)

    def loss(x):
        return jnp.sum(he.hash_encode(table, x, 0.0, 1.0, cfg))

    g = jax.grad(loss)(jnp.asarray([[0.31, 0.42, 0.53]]))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_level_scales_geometric():
    cfg = HashConfig(num_levels=16, n_min=16, n_max=2048)
    s = he.level_scales(cfg)
    assert abs(s[0] - 16) < 1e-9 and abs(s[-1] - 2048) < 1e-6
    ratios = s[1:] / s[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-9)
