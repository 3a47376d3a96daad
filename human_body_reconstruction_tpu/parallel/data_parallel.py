"""Multi-chip scaling: ray-batch data parallelism over a 1-D device mesh.

The reference's entire parallelism story is single-process
``torch.nn.DataParallel`` around the MLP only (train_hash2.py:127,
SURVEY.md section 2.2).  The TPU-native equivalent is strictly stronger:

  * a 1-D ``jax.sharding.Mesh`` over axis "data",
  * the ray batch is sharded across chips — each device samples its own
    (batch/n) rays on-device (RNG folded with the axis index),
  * params (hash table + MLP) are replicated; gradients are reduced with
    ``jax.lax.pmean`` over ICI inside ``shard_map``,
  * the optimizer update runs replicated, so no weight broadcast is
    needed afterwards.

The hash table at default settings is small (16 * 2^16 * 2 fp32 = 8 MB),
so replication + psum is the right layout per the scaling-book recipe;
sharding the table (all_gather on use) only pays at T >= 2^19.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from human_body_reconstruction_tpu.train.state import TrainState
from human_body_reconstruction_tpu.train.step import loss_fn, sample_ray_batch
from human_body_reconstruction_tpu.utils.config import PipelineConfig

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    import numpy as np
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices).reshape(-1), (DATA_AXIS,))


def make_dp_train_step(cfg: PipelineConfig, tx, batch_size: int, mesh: Mesh,
                       steps_per_call: int = 1):
    """Build a jitted data-parallel train step closed over (cfg, tx, mesh).

    The returned function has the same signature/semantics as
    ``train.step.train_step`` (global batch of ``batch_size`` rays per
    call) but shards the ray work across ``mesh``.  With
    ``steps_per_call`` > 1 it runs that many optimizer steps per dispatch
    (``lax.scan``, as in ``train.step.train_step_multi``) and returns
    window-mean metrics — the per-chip RNG stays fresh per step because
    the key fold uses ``state.step`` inside the sharded body.
    """
    n = mesh.devices.size
    if batch_size % n:
        raise ValueError(f"batch_size {batch_size} not divisible by mesh size {n}")
    local_batch = batch_size // n
    compute_dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                     else None)

    def shard_fn(state, scene, images, c2ws, K, key):
        axis = jax.lax.axis_index(DATA_AXIS)
        k = jax.random.fold_in(jax.random.fold_in(key, state.step), axis)
        k_batch, k_render = jax.random.split(k)
        batch = sample_ray_batch(k_batch, images, c2ws, K, local_batch)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, scene, batch, k_render, cfg, state.occ,
            compute_dtype, step=state.step)
        # Gradient all-reduce over ICI; metrics averaged the same way.
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        aux = jax.tree.map(lambda a: jax.lax.pmean(a, DATA_AXIS), aux)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, occ=state.occ)
        return new_state, {"loss": loss, **aux}

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, scene, images, c2ws, K, key):
        if steps_per_call <= 1:
            return sharded(state, scene, images, c2ws, K, key)

        def body(st, _):
            return sharded(st, scene, images, c2ws, K, key)

        st, metrics = jax.lax.scan(body, state, length=steps_per_call)
        return st, jax.tree.map(lambda x: jnp.mean(x, axis=0), metrics)

    return step


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_render(cfg: PipelineConfig, mesh: Mesh, num_samples: int = 256,
                   hierarchical: bool = False):
    """Jitted eval render with the ray axis sharded across the mesh.

    Returns render(params, scene, rays_o, rays_d, dir_norm, key) -> rgb;
    the global ray count must divide the mesh size.  Params replicated,
    rays sharded, zero collectives (each chip renders its slice).
    """
    from human_body_reconstruction_tpu.models import nerf

    def shard_fn(params, scene, rays_o, rays_d, dir_norm, key):
        out = nerf.render_rays(params, scene, rays_o, rays_d, dir_norm,
                               key, cfg, num_samples=num_samples,
                               hierarchical=hierarchical, jitter=False,
                               compute_dtype=jnp.bfloat16)
        return out["fine"]

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS), check_vma=False)

    @jax.jit
    def render(params, scene, rays_o, rays_d, dir_norm, key):
        return sharded(params, scene, rays_o, rays_d, dir_norm, key)

    return render
