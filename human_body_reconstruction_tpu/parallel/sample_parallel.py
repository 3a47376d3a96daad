"""Sample-axis (sequence) parallelism: one render, samples split over chips.

The reference scales the sample axis only by chunking rays on one GPU
(vol_renderer.py:249-256); SURVEY.md section 5 marks cross-chip
transmittance composition as the TPU-native stretch goal, and this
module implements it.  Emission-absorption compositing is associative in
log-transmittance: for a ray split into contiguous segments s = 0..n-1,

    tau_s    = sum_i sigma_i dt_i                 (segment optical depth)
    C_s      = sum_i T^loc_i alpha_i rgb_i        (segment partial colour)
    T_pre_s  = exp(-sum_{j<s} tau_j)              (upstream transmittance)
    C        = sum_s T_pre_s * C_s                (exact global colour)

so each chip of a mesh axis "sample" renders S/n contiguous samples of
EVERY ray, then one tiny `all_gather` of per-segment optical depths
((n, B) floats over ICI) and one `psum` of prefix-weighted partial
colours reconstruct the exact single-chip result — the field evaluation
(hash gathers + MLP), which is all the work, never crosses a chip.

Composable with ray data-parallelism on a 2-D ("data", "sample") mesh:
rays shard over "data", samples over "sample"; the collectives ride the
"sample" axis only.

Use case: giant eval/offline renders (hundreds of samples per ray at
high resolution) where a single chip's HBM or latency budget is the
limit — e.g. 800x800 x 1024 samples = 655M field evaluations in one
logical call.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from human_body_reconstruction_tpu.models import nerf
from human_body_reconstruction_tpu.ops import compositing, occupancy, positional
from human_body_reconstruction_tpu.utils.config import PipelineConfig

DATA_AXIS = "data"
SAMPLE_AXIS = "sample"


def make_sp_mesh(n_data: int, n_sample: int, devices=None) -> Mesh:
    """2-D (data, sample) mesh; either extent may be 1."""
    import numpy as np

    devices = jax.devices() if devices is None else devices
    if n_data * n_sample != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_sample} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(n_data, n_sample),
                (DATA_AXIS, SAMPLE_AXIS))


def make_sp_render(cfg: PipelineConfig, mesh: Mesh, num_samples: int,
                   compute_dtype=jnp.bfloat16):
    """Jitted sample-parallel (optionally + data-parallel) eval render.

    Returns render(params, scene, rays_o, rays_d, dir_norm) -> rgb
    (B, 3), bit-matching the single-device deterministic render up to
    float reassociation.  The global ray count must divide the mesh's
    "data" extent; ``num_samples`` must divide its "sample" extent.

    SDF mode (cfg.render.use_sdf): the NeuS-style phi-ratio compositor
    (compositing.composite_sdf, reference helper.py:80-85) is also
    segment-associative — alpha_i depends only on the ADJACENT pair
    (phi_i, phi_{i+1}), so the segment boundary needs exactly one halo
    value (the next segment's first phi, one ``ppermute`` hop over ICI),
    and upstream transmittance is a strict-prefix PRODUCT of per-segment
    (1 - alpha) products (one tiny ``all_gather``), replacing the
    density mode's optical-depth prefix sum.
    """
    n_s = mesh.shape[SAMPLE_AXIS]
    if num_samples % n_s:
        raise ValueError(f"num_samples {num_samples} not divisible by "
                         f"sample-axis size {n_s}")
    s_loc = num_samples // n_s
    near, far = cfg.render.near, cfg.render.far

    def shard_fn(params, scene, rays_o, rays_d, dir_norm, occ):
        s_idx = jax.lax.axis_index(SAMPLE_AXIS)
        B = rays_o.shape[0]

        # identical deterministic global ladder on every sample shard
        t_full = jnp.linspace(near, far, num_samples, dtype=jnp.float32)
        dt_full = jnp.concatenate(
            [t_full[1:] - t_full[:-1], jnp.zeros((1,), jnp.float32)])
        t = jax.lax.dynamic_slice_in_dim(t_full, s_idx * s_loc, s_loc)
        dt = jax.lax.dynamic_slice_in_dim(dt_full, s_idx * s_loc, s_loc)
        t = jnp.broadcast_to(t[None, :], (B, s_loc))
        dt = jnp.broadcast_to(dt[None, :], (B, s_loc))

        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        dirs_enc = positional.positional_encode(
            rays_d, cfg.dir_enc.num_freq, cfg.dir_enc.mode)
        dirs_rep = jnp.broadcast_to(dirs_enc[:, None, :],
                                    (B, s_loc, dirs_enc.shape[-1]))
        rgb, density = nerf.field_forward(
            params, scene, pts.reshape(B * s_loc, 3),
            dirs_rep.reshape(B * s_loc, -1), cfg,
            compute_dtype=compute_dtype)
        rgb = rgb.reshape(B, s_loc, 3)
        density = density.reshape(B, s_loc)
        if occ is not None:
            density = density * occupancy.lookup(occ, pts, scene["mu"],
                                                 scene["sigma"])

        if cfg.render.use_sdf:
            # phi-ratio alpha needs ONE neighbour phi across the chip
            # boundary: each chip ppermutes its first phi to the chip
            # holding the PREVIOUS segment (the halo exchange); the
            # last chip's final alpha is 0 by definition (the reference
            # concatenates a zero, helper.py:84)
            b = params["var"]["b"]
            phi = jnp.clip(compositing.jax_sigmoid(b * density), 1e-6, 1.0)
            ratio_in = phi[:, 1:] / phi[:, :-1]              # (B, s_loc-1)
            perm = [(i, i - 1) for i in range(1, n_s)]
            nxt_first = jax.lax.ppermute(phi[:, 0], SAMPLE_AXIS, perm)
            ratio_last = jnp.where(s_idx == n_s - 1, 1.0,
                                   nxt_first / phi[:, -1])   # (B,)
            alpha = jnp.maximum(
                1.0 - jnp.concatenate([ratio_in, ratio_last[:, None]],
                                      axis=-1), 0.0)         # (B, s_loc)
            one_m = 1.0 - alpha
            t_local = compositing.exclusive_cumprod(one_m, axis=-1)
            c_local = jnp.sum((t_local * alpha)[..., None] * rgb, axis=-2)
            seg_prod = jnp.prod(one_m, axis=-1)              # (B,)
            prods = jax.lax.all_gather(seg_prod, SAMPLE_AXIS)  # (n_s, B)
            seg = jnp.arange(n_s, dtype=s_idx.dtype)
            t_pre = jnp.prod(jnp.where((seg < s_idx)[:, None], prods, 1.0),
                             axis=0)                         # (B,)
            return jax.lax.psum(t_pre[:, None] * c_local, SAMPLE_AXIS)

        sigma = jnp.maximum(density, cfg.render.sigma_clip_min)
        dn = jnp.reshape(dir_norm, (-1,))       # accept (B,) or (B, 1)
        prod = sigma * dt * dn[:, None]
        alpha = 1.0 - jnp.exp(-prod)
        t_local = jnp.exp(-compositing.exclusive_cumsum(prod, axis=-1))
        w_local = t_local * alpha                               # (B, s_loc)
        c_local = jnp.sum(w_local[..., None] * rgb, axis=-2)    # (B, 3)
        tau = jnp.sum(prod, axis=-1)                            # (B,)

        # upstream transmittance: gather every segment's optical depth
        # (tiny: (n_s, B) floats over ICI) and sum the strict prefix
        taus = jax.lax.all_gather(tau, SAMPLE_AXIS)             # (n_s, B)
        seg = jnp.arange(n_s, dtype=s_idx.dtype)
        prefix = jnp.sum(jnp.where((seg < s_idx)[:, None], taus, 0.0),
                         axis=0)                                # (B,)
        t_pre = jnp.exp(-prefix)

        color = jax.lax.psum(t_pre[:, None] * c_local, SAMPLE_AXIS)
        if cfg.render.white_background:
            acc = jax.lax.psum(t_pre * jnp.sum(w_local, axis=-1),
                               SAMPLE_AXIS)
            color = color + (1.0 - acc[:, None])
        return color

    has_data = DATA_AXIS in mesh.shape
    ray_spec = P(DATA_AXIS) if has_data else P()
    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), ray_spec, ray_spec, ray_spec, P()),
        out_specs=ray_spec, check_vma=False)

    @jax.jit
    def render(params, scene, rays_o, rays_d, dir_norm, occ=None):
        return sharded(params, scene, rays_o, rays_d, dir_norm, occ)

    return render
