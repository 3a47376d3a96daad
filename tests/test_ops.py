"""Unit tests for the geometry / sampling / compositing core.

Each test checks a pure function against an independent numpy reference
(SURVEY.md section 4 test plan, item 1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.ops import compositing, positional, rays, sampling


# ---------------------------------------------------------------------------
# rays
# ---------------------------------------------------------------------------

def make_K(fx=100.0, fy=110.0, cx=32.0, cy=24.0):
    return jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)


def test_rays_identity_pose_center_pixel():
    K = make_K()
    c2w = jnp.eye(4)
    o, d, n = rays.rays_for_pixels(jnp.asarray([32.0]), jnp.asarray([24.0]), K, c2w)
    # Center pixel looks straight down -z.
    np.testing.assert_allclose(np.asarray(o), [[0, 0, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), [[0, 0, -1]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), [[1.0]], atol=1e-6)


def test_rays_known_offsets():
    K = make_K(fx=100.0, fy=100.0, cx=0.0, cy=0.0)
    c2w = jnp.eye(4)
    o, d, n = rays.rays_for_pixels(jnp.asarray([100.0]), jnp.asarray([0.0]), K, c2w)
    # dir before normalisation: (1, 0, -1); j sign is flipped.
    expect = np.array([1.0, 0.0, -1.0]) / np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(d[0]), expect, atol=1e-6)
    np.testing.assert_allclose(float(n[0, 0]), np.sqrt(2.0), atol=1e-6)


def test_rays_rotation_and_translation():
    K = make_K()
    # 90 deg rotation about y: x->-z, z->x ; translation (1,2,3).
    R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R
    c2w[:3, 3] = [1, 2, 3]
    o, d, _ = rays.rays_for_pixels(
        jnp.asarray([32.0]), jnp.asarray([24.0]), K, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(o), [[1, 2, 3]], atol=1e-6)
    # camera -z maps to world (-1*R[:,2]) = (-1, 0, 0)
    np.testing.assert_allclose(np.asarray(d), [[-1, 0, 0]], atol=1e-6)


def test_full_image_rays_row_major():
    K = make_K(cx=1.0, cy=1.0, fx=1.0, fy=1.0)
    o, d, n = rays.full_image_rays(2, 3, K, jnp.eye(4))
    assert o.shape == (6, 3) and d.shape == (6, 3) and n.shape == (6, 1)
    # ray 1 is pixel (i=1, j=0): dir pre-norm (0, 1, -1)
    np.testing.assert_allclose(
        np.asarray(d[1]), np.array([0, 1, -1]) / np.sqrt(2), atol=1e-6)


def test_scene_bounds_contains_ray_extremes():
    K = make_K()
    c2ws = jnp.stack([jnp.eye(4)] * 2)
    lo, hi = rays.scene_bounds(48, 64, K, c2ws, near=2.0, far=6.0)
    assert lo.shape == (3,) and hi.shape == (3,)
    # camera at origin looking down -z: z range covers [-7.5, -2]
    assert float(lo[2]) <= -7.49
    assert float(hi[2]) >= -2.01
    assert np.all(np.asarray(lo) <= np.asarray(hi))


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_stratified_in_bins():
    key = jax.random.PRNGKey(0)
    t = sampling.stratified_ts(key, (7,), 2.0, 6.0, 16)
    assert t.shape == (7, 16)
    base = np.linspace(2.0, 6.0, 16)
    step = 4.0 / 16
    tn = np.asarray(t)
    assert np.all(tn >= base[None, :] - 1e-6)
    assert np.all(tn <= base[None, :] + step + 1e-6)
    # per-ray jitter: rows differ
    assert np.std(tn[:, 0]) > 0


def test_stratified_shared_jitter_matches_reference_shape():
    key = jax.random.PRNGKey(0)
    t = sampling.stratified_ts(key, (5,), 2.0, 6.0, 8, per_ray_jitter=False)
    tn = np.asarray(t)
    # all rays share one jitter vector (reference helper.py:234-235)
    assert np.allclose(tn, tn[0:1])


def test_sample_pdf_concentrates_mass():
    key = jax.random.PRNGKey(1)
    bins = jnp.linspace(0.0, 1.0, 65)[None, :].repeat(4, axis=0)
    w = jnp.zeros((4, 64)).at[:, 32].set(1.0)  # all mass in bin 32
    t = sampling.sample_pdf(key, bins, w, 128)
    tn = np.asarray(t)
    lo, hi = 32 / 64, 33 / 64
    frac_inside = np.mean((tn >= lo - 1e-3) & (tn <= hi + 1e-3))
    assert frac_inside > 0.95


def test_sample_pdf_uniform_statistics():
    key = jax.random.PRNGKey(2)
    bins = jnp.linspace(0.0, 1.0, 33)[None, :]
    w = jnp.ones((1, 32))
    t = np.asarray(sampling.sample_pdf(key, bins, w, 4096))
    assert abs(t.mean() - 0.5) < 0.02
    assert abs(np.var(t) - 1 / 12) < 0.01


def test_hierarchical_sorted_and_shaped():
    key = jax.random.PRNGKey(3)
    t_coarse = jnp.sort(jax.random.uniform(key, (3, 16), minval=2, maxval=6), axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(4), (3, 16))
    t_all = sampling.hierarchical_ts(key, t_coarse, w, 16)
    assert t_all.shape == (3, 32)
    tn = np.asarray(t_all)
    assert np.all(np.diff(tn, axis=-1) >= 0)


# ---------------------------------------------------------------------------
# compositing
# ---------------------------------------------------------------------------

def numpy_composite(t, rgb, sigma, dir_norm):
    """Direct numpy transcription of the math in reference helper.py:53-107."""
    t = np.asarray(t); rgb = np.asarray(rgb); sigma = np.asarray(sigma)
    dt = np.zeros_like(t)
    dt[..., :-1] = t[..., 1:] - t[..., :-1]
    dt = dt * dir_norm
    sigma = np.maximum(sigma, -10.0)
    prod = sigma * dt
    alpha = 1 - np.exp(-prod)
    T = np.exp(-np.cumsum(prod, axis=-1))
    T = np.roll(T, 1, axis=-1)
    T[..., 0] = 1
    w = T * alpha
    C = (w[..., None] * rgb).sum(axis=-2)
    return C, w


def test_composite_matches_numpy_reference():
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(2, 6, size=(5, 32)), axis=-1).astype(np.float32)
    rgb = rng.rand(5, 32, 3).astype(np.float32)
    sigma = rng.uniform(-1, 3, size=(5, 32)).astype(np.float32)
    dn = rng.uniform(0.9, 1.4, size=(5, 1)).astype(np.float32)

    C, w, T = compositing.composite(jnp.asarray(t), jnp.asarray(rgb),
                                    jnp.asarray(sigma), jnp.asarray(dn))
    C_ref, w_ref = numpy_composite(t, rgb, sigma, dn)
    np.testing.assert_allclose(np.asarray(C), C_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4, atol=1e-5)


def test_composite_opaque_wall():
    # A very dense slab at sample k: colour should be rgb[k].
    t = jnp.linspace(0.0, 1.0, 64)[None, :]
    sigma = jnp.zeros((1, 64)).at[0, 20].set(1e4)
    rgb = jnp.zeros((1, 64, 3)).at[0, 20].set(jnp.asarray([0.3, 0.6, 0.9]))
    C, w, _ = compositing.composite(t, rgb, sigma, None)
    np.testing.assert_allclose(np.asarray(C[0]), [0.3, 0.6, 0.9], atol=1e-4)
    assert float(w[0, 20]) > 0.999


def test_composite_empty_space_white_bg():
    t = jnp.linspace(0.0, 1.0, 16)[None, :]
    sigma = jnp.zeros((1, 16))
    rgb = jnp.ones((1, 16, 3)) * 0.5
    C, _, _ = compositing.composite(t, rgb, sigma, None, white_background=True)
    np.testing.assert_allclose(np.asarray(C[0]), [1, 1, 1], atol=1e-6)


def test_exclusive_cumprod_matches_reference_semantics():
    x = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    out = np.asarray(compositing.exclusive_cumprod(x))
    np.testing.assert_allclose(out, [[1.0, 0.5, 0.25, 0.125]], atol=1e-7)


def test_composite_sdf_shapes_and_range():
    t = jnp.linspace(0.0, 1.0, 32)[None, :].repeat(2, axis=0)
    sdf = jnp.linspace(1.0, -1.0, 32)[None, :].repeat(2, axis=0)  # surface crossing
    rgb = jnp.ones((2, 32, 3)) * 0.5
    C, w, T = compositing.composite_sdf(t, rgb, sdf, jnp.asarray(4.0))
    assert C.shape == (2, 3)
    wn = np.asarray(w)
    assert np.all(wn >= -1e-6)
    # weight mass concentrates near the zero crossing (middle)
    assert wn[0].argmax() > 8 and wn[0].argmax() < 24


def test_psnr():
    a = jnp.zeros((4, 4))
    b = jnp.ones((4, 4)) * 0.1
    assert abs(float(compositing.psnr(a, b)) - 20.0) < 1e-3


# ---------------------------------------------------------------------------
# positional encoding
# ---------------------------------------------------------------------------

def test_positional_linear_matches_reference_formula():
    x = jnp.asarray([[0.3, -0.7, 0.2]])
    out = positional.positional_encode(x, num_freq=4, mode="linear")
    assert out.shape == (1, 24)
    xn = np.asarray(x)
    k = np.arange(4)
    expect = []
    for c in range(3):
        expect.extend(np.sin(2 * xn[0, c] * k))
        expect.extend(np.cos(2 * xn[0, c] * k))
    np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-6)


def test_positional_nerf_mode():
    x = jnp.asarray([[0.5]])
    out = positional.positional_encode(x, num_freq=3, mode="nerf")
    expect = np.concatenate([np.sin([0.5, 1.0, 2.0]), np.cos([0.5, 1.0, 2.0])])
    np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-6)


def test_positional_bad_mode():
    with pytest.raises(ValueError):
        positional.positional_encode(jnp.zeros((1, 3)), 4, mode="nope")


def test_humanoid_field_structure():
    from human_body_reconstruction_tpu.data import synthetic

    # head is dense, empty space is empty
    rgb, sigma = synthetic.humanoid_field(
        jnp.asarray([[0.0, 0.0, 0.65],    # head centre
                     [0.0, 0.0, 0.25],    # torso
                     [2.0, 2.0, 2.0]]))   # empty
    s = np.asarray(sigma)
    assert s[0] > 10 and s[1] > 10 and s[2] < 1e-3
    c = np.asarray(rgb)
    # torso is blue-ish, head skin-toned
    assert c[1, 2] > c[1, 0]
    assert c[0, 0] > c[0, 2]


def test_humanoid_dataset_renders():
    from human_body_reconstruction_tpu.data import synthetic

    ds = synthetic.make_dataset(n_views=2, H=32, W=32,
                                field=synthetic.humanoid_field,
                                elevation=0.15)
    img = np.asarray(ds["images"][0])
    assert img.max() > 0.3          # subject visible
    assert (img < 0.02).mean() > 0.3  # mostly empty background


def test_sample_pdf_deterministic():
    bins = jnp.linspace(0.0, 1.0, 17)[None, :]
    w = jnp.ones((1, 16))
    t1 = sampling.sample_pdf(None, bins, w, 32, deterministic=True)
    t2 = sampling.sample_pdf(None, bins, w, 32, deterministic=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    tn = np.asarray(t1[0])
    assert np.all(np.diff(tn) >= 0) and tn[0] >= 0 and tn[-1] <= 1


def test_stratified_log_sampling():
    key = jax.random.PRNGKey(5)
    t = sampling.stratified_ts(key, (4,), 2.0, 6.0, 16, log_sampling=True)
    tn = np.asarray(t)
    assert tn.min() >= 2.0 - 1e-5
    # log-spaced: early gaps smaller than late gaps on average
    gaps = np.diff(np.sort(tn, axis=-1), axis=-1)
    assert gaps[:, :4].mean() < gaps[:, -4:].mean()
