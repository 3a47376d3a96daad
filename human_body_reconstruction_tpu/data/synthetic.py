"""Procedural synthetic scenes for tests and benchmarks.

The environment ships no lego/tiny-nerf data, so correctness is proven on
procedural volumes rendered analytically with the SAME compositing math:
train the field on GT images of a known emissive volume and require high
PSNR (SURVEY.md section 4, golden-image integration tests).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.ops import compositing, rays as rays_lib


def look_at_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """OpenGL-style c2w (camera looks down its -z) as (4, 4) float32."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = eye - target                       # camera -z points at target
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right = right / np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def orbit_poses(n: int, radius: float = 4.0, elevation: float = 0.5):
    """n poses on a circle around the origin at the given elevation."""
    poses = []
    for k in range(n):
        th = 2 * np.pi * k / n
        eye = (radius * np.cos(th), radius * np.sin(th), elevation * radius)
        poses.append(look_at_pose(eye))
    return np.stack(poses)


def blob_field(pts):
    """Analytic emissive volume: two coloured Gaussian blobs.

    Returns (rgb (N, 3), sigma (N,)).
    """
    c1 = jnp.asarray([0.35, 0.0, 0.0])
    c2 = jnp.asarray([-0.35, 0.2, 0.1])
    d1 = jnp.sum((pts - c1) ** 2, axis=-1)
    d2 = jnp.sum((pts - c2) ** 2, axis=-1)
    s1 = 40.0 * jnp.exp(-d1 / (2 * 0.3 ** 2))
    s2 = 30.0 * jnp.exp(-d2 / (2 * 0.25 ** 2))
    sigma = s1 + s2
    w1 = s1 / (sigma + 1e-9)
    rgb = (w1[..., None] * jnp.asarray([0.9, 0.3, 0.2]) +
           (1 - w1)[..., None] * jnp.asarray([0.2, 0.5, 0.9]))
    return rgb, sigma


def _capsule_dist(pts, a, b, r):
    """Distance from pts to the capsule with axis segment a-b, radius r."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ab = b - a
    t = jnp.clip(jnp.dot(pts - a, ab) / jnp.dot(ab, ab), 0.0, 1.0)
    closest = a + t[:, None] * ab
    return jnp.linalg.norm(pts - closest, axis=-1) - r


# (a, b, radius, rgb) — a stick figure ~1.6 units tall centred on origin
_HUMANOID_PARTS = (
    ((0.0, 0.0, 0.55), (0.0, 0.0, 0.75), 0.13, (0.9, 0.75, 0.65)),   # head
    ((0.0, 0.0, 0.05), (0.0, 0.0, 0.45), 0.17, (0.2, 0.35, 0.7)),    # torso
    ((-0.16, 0.0, 0.42), (-0.42, 0.0, 0.05), 0.06, (0.9, 0.75, 0.65)),  # L arm
    ((0.16, 0.0, 0.42), (0.42, 0.0, 0.05), 0.06, (0.9, 0.75, 0.65)),   # R arm
    ((-0.09, 0.0, -0.05), (-0.12, 0.0, -0.75), 0.07, (0.25, 0.25, 0.3)),  # L leg
    ((0.09, 0.0, -0.05), (0.12, 0.0, -0.75), 0.07, (0.25, 0.25, 0.3)),   # R leg
)


def humanoid_field(pts):
    """Analytic emissive volume shaped like a standing figure.

    A harder, articulated test subject for the reconstruction pipeline
    (the framework's actual purpose); density falls off smoothly at each
    capsule surface, colour comes from the nearest part.
    Returns (rgb (N, 3), sigma (N,)).
    """
    dists = jnp.stack([_capsule_dist(pts, a, b, r)
                       for a, b, r, _ in _HUMANOID_PARTS], axis=-1)  # (N, P)
    colors = jnp.asarray([c for _, _, _, c in _HUMANOID_PARTS])      # (P, 3)
    sharp = 60.0
    part_sigma = 50.0 * jax.nn.sigmoid(-sharp * dists)               # (N, P)
    sigma = jnp.sum(part_sigma, axis=-1)
    w = part_sigma / (sigma[:, None] + 1e-9)
    rgb = w @ colors
    return rgb, sigma


def sphere_field(pts, radius: float = 0.6):
    """SDF-friendly subject: one solid sphere with a smooth colour ramp.

    Used by the SDF-mode convergence test — the recovered zero level set
    must sit at ``radius``.  Returns (rgb (N, 3), sigma (N,)).
    """
    r = jnp.linalg.norm(pts, axis=-1)
    sigma = 80.0 * jax.nn.sigmoid(-40.0 * (r - radius))
    rgb = jnp.stack([0.75 + 0.2 * pts[:, 0],
                     0.45 + 0.2 * pts[:, 1],
                     0.35 + 0.2 * pts[:, 2]], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0), sigma


def textured_field(pts, freq: float = 24.0):
    """HARD quality benchmark subject: high-frequency texture + thin
    structures (VERDICT.md round-1 weak #3 — the smooth blob scenes
    cannot stress hash collisions or the accelerated encoder modes).

    Geometry: a thin spherical shell (thickness ~0.05), three thin rods
    (r=0.03) crossing the interior, and a small solid core.  Albedo: a
    3-octave trig "checker-noise" with wavelengths down to ~0.08 units —
    at 400 px across a ~2.5-unit subject that is ~6-13 px per feature,
    unresolvable by coarse levels, so fidelity depends on the fine
    (hashed, collision-prone) levels actually learning.
    Returns (rgb (N, 3), sigma (N,)).
    """
    r = jnp.linalg.norm(pts, axis=-1)
    sharp = 200.0
    # thin shell at radius 0.85
    shell = jnp.exp(-((r - 0.85) / 0.025) ** 2)
    # three thin axis-aligned rods through the centre
    rod_r = 0.03
    rx = jnp.sqrt(pts[:, 1] ** 2 + pts[:, 2] ** 2)
    ry = jnp.sqrt(pts[:, 0] ** 2 + pts[:, 2] ** 2)
    rz = jnp.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    inside = (r < 0.95).astype(jnp.float32)
    rods = (jax.nn.sigmoid(-sharp * (rx - rod_r))
            + jax.nn.sigmoid(-sharp * (ry - rod_r))
            + jax.nn.sigmoid(-sharp * (rz - rod_r))) * inside
    core = jax.nn.sigmoid(-sharp * (r - 0.18))
    sigma = 120.0 * shell + 90.0 * jnp.clip(rods, 0.0, 1.0) + 90.0 * core

    # 3-octave incommensurate trig texture per channel
    def octave(p, f, phase):
        return (jnp.sin(f * p[:, 0] + phase)
                * jnp.sin(f * 1.31 * p[:, 1] + 2.1 * phase)
                * jnp.sin(f * 0.87 * p[:, 2] + 0.7 * phase))

    tex_r = (octave(pts, freq, 0.0) + 0.5 * octave(pts, 2.3 * freq, 1.0))
    tex_g = (octave(pts, 1.7 * freq, 2.0) + 0.5 * octave(pts, 3.1 * freq, 0.4))
    tex_b = (octave(pts, 1.3 * freq, 4.0) + 0.5 * octave(pts, 2.7 * freq, 1.7))
    rgb = jnp.stack([0.5 + 0.33 * tex_r,
                     0.5 + 0.33 * tex_g,
                     0.5 + 0.33 * tex_b], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0), sigma


def textured_humanoid_field(pts, freq: float = 24.0):
    """Second HARD scene family (VERDICT r2 item 3): the articulated
    standing figure (the reference's actual subject class — a human
    body) carrying the same 3-octave high-frequency albedo as
    :func:`textured_field`, so fine-level fidelity is stressed on
    human-shaped thin geometry (limbs ~0.06 radius) instead of shells."""
    _, sigma = humanoid_field(pts)

    def octave(p, f, phase):
        return (jnp.sin(f * p[:, 0] + phase)
                * jnp.sin(f * 1.31 * p[:, 1] + 2.1 * phase)
                * jnp.sin(f * 0.87 * p[:, 2] + 0.7 * phase))

    tex_r = (octave(pts, freq, 0.0) + 0.5 * octave(pts, 2.3 * freq, 1.0))
    tex_g = (octave(pts, 1.7 * freq, 2.0) + 0.5 * octave(pts, 3.1 * freq, 0.4))
    tex_b = (octave(pts, 1.3 * freq, 4.0) + 0.5 * octave(pts, 2.7 * freq, 1.7))
    rgb = jnp.stack([0.5 + 0.33 * tex_r,
                     0.5 + 0.33 * tex_g,
                     0.5 + 0.33 * tex_b], axis=-1)
    return jnp.clip(rgb, 0.0, 1.0), sigma


def tangle_field(pts, seed: int = 0, n_capsules: int = 14,
                 freq: float = 24.0):
    """HELD-BACK third scene family (VERDICT r3 item 6): a seeded random
    capsule tangle with randomized high-frequency texture.

    The two standing quality-gate families (textured shell+rods,
    textured humanoid) share authorship with the tuning loop — every
    flag decision has seen their renders.  This family is PARAMETER-
    RANDOMIZED: geometry (capsule endpoints/radii) and texture
    (per-channel frequencies and phases) derive from ``seed`` via the
    JAX PRNG, so an eval seed the tuning loop has never trained or
    tuned against is a genuinely held-out scene.  Protocol: the
    quality matrix's heldback runs use seeds >= 100; seeds < 100 are
    free for debugging (and burning one marks it used — switch to the
    next).  Geometry stays in the hard regime of the gate scenes: thin
    structures (radii 0.03-0.07) and ~6-13 px texture wavelengths.
    Returns (rgb (N, 3), sigma (N,))."""
    key = jax.random.PRNGKey(seed)
    ka, kb, kr, kf, kp = jax.random.split(key, 5)
    # capsule segments inside the ~0.85 ball: start points uniform in a
    # centred box, directions iid normal scaled to 0.3-0.8 length
    a = jax.random.uniform(ka, (n_capsules, 3), minval=-0.55, maxval=0.55)
    step = jax.random.normal(kb, (n_capsules, 3))
    step = step / (jnp.linalg.norm(step, axis=-1, keepdims=True) + 1e-9)
    ln = jax.random.uniform(kb, (n_capsules, 1), minval=0.3, maxval=0.8)
    b = jnp.clip(a + step * ln, -0.8, 0.8)
    radii = jax.random.uniform(kr, (n_capsules,), minval=0.03,
                               maxval=0.07)

    # vectorised point-to-segment distance over all capsules at once
    ab = b - a                                                   # (C, 3)
    t = jnp.clip((jnp.einsum("nd,cd->nc", pts, ab)
                  - jnp.sum(a * ab, axis=-1)[None, :])
                 / (jnp.sum(ab * ab, axis=-1)[None, :] + 1e-9),
                 0.0, 1.0)                                       # (N, C)
    closest = a[None, :, :] + t[..., None] * ab[None, :, :]      # (N, C, 3)
    dists = (jnp.linalg.norm(pts[:, None, :] - closest, axis=-1)
             - radii[None, :])                                   # (N, C)
    sharp = 200.0
    part_sigma = 90.0 * jax.nn.sigmoid(-sharp * dists)
    sigma = jnp.sum(part_sigma, axis=-1)

    # randomized 2-octave incommensurate texture per channel
    f = jax.random.uniform(kf, (3, 2), minval=0.8, maxval=1.4) * freq
    f = f * jnp.asarray([[1.0, 2.3], [1.7, 3.1], [1.3, 2.7]])
    ph = jax.random.uniform(kp, (3, 2), minval=0.0, maxval=6.28)
    sx = jax.random.uniform(kp, (3, 2), minval=0.8, maxval=1.5)

    def octave(p, fr, phase, s):
        return (jnp.sin(fr * p[:, 0] + phase)
                * jnp.sin(fr * 1.31 * s * p[:, 1] + 2.1 * phase)
                * jnp.sin(fr * 0.87 * s * p[:, 2] + 0.7 * phase))

    chans = []
    for c in range(3):
        chans.append(0.5 + 0.33 * (octave(pts, f[c, 0], ph[c, 0], sx[c, 0])
                                   + 0.5 * octave(pts, f[c, 1], ph[c, 1],
                                                  sx[c, 1])))
    rgb = jnp.stack(chans, axis=-1)
    return jnp.clip(rgb, 0.0, 1.0), sigma


def render_gt_image(H: int, W: int, K, c2w, field=blob_field,
                    near: float = 2.0, far: float = 6.0,
                    num_samples: int = 256, chunk_rays: int = 16384):
    """Ground-truth render of the analytic field (dense uniform sampling).

    Chunked over rays: per-capsule fields materialise (N_pts, C, 3)
    intermediates, and at the 400x400x384 quality-protocol shape the
    unchunked tangle_field peaks >10 GB on chip (HBM ResourceExhausted,
    round-4 heldback run).  16k rays x 384 samples keeps the peak ~1 GB.
    """
    o, d, n = rays_lib.full_image_rays(H, W, K, jnp.asarray(c2w))
    t_row = jnp.linspace(near, far, num_samples)
    out = []
    for s in range(0, o.shape[0], chunk_rays):
        oc, dc = o[s:s + chunk_rays], d[s:s + chunk_rays]
        nc = n[s:s + chunk_rays]
        t = jnp.broadcast_to(t_row, (oc.shape[0], num_samples))
        pts = oc[:, None, :] + dc[:, None, :] * t[..., None]
        rgb, sigma = field(pts.reshape(-1, 3))
        rgb = rgb.reshape(oc.shape[0], num_samples, 3)
        sigma = sigma.reshape(oc.shape[0], num_samples)
        C, _, _ = compositing.composite(t, rgb, sigma, nc)
        out.append(np.asarray(C))
    return np.concatenate(out, axis=0).reshape(H, W, 3)


def make_dataset(n_views: int = 8, H: int = 48, W: int = 48,
                 focal: float = 55.0, near: float = 2.0, far: float = 6.0,
                 field=blob_field, radius: float = 4.0,
                 elevation: float = 0.5, gt_samples: int = 0):
    """Full tiny synthetic dataset: images + poses + intrinsics.

    ``field`` selects the subject: :func:`blob_field` (default, smooth)
    or :func:`humanoid_field` (articulated standing figure).
    """
    K = jnp.asarray([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                    jnp.float32)
    c2ws = orbit_poses(n_views, radius=radius, elevation=elevation)
    kw = {"num_samples": gt_samples} if gt_samples else {}
    images = np.stack([
        render_gt_image(H, W, K, c2ws[k], field=field, near=near, far=far,
                        **kw)
        for k in range(n_views)])
    return {"images": jnp.asarray(images), "c2ws": jnp.asarray(c2ws),
            "K": K, "H": H, "W": W, "near": near, "far": far}
