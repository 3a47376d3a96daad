"""Multi-scene batched fitting: train S independent hash-NeRFs at once.

The stretch capability from BASELINE.md config 5 ("multi-scene batched
fitting on v5e-8"), impossible in the reference's architecture: because
params are pure pytrees and the train math is pure functions, fitting S
scenes is just ``jax.vmap`` over a leading scene axis on (params, scene
constants, images, poses), and scaling over chips is sharding that scene
axis across a mesh — each chip fits its own subset of scenes with zero
cross-chip communication (embarrassingly parallel; ICI only carries the
replicated-metric mean).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.train.state import TrainState, make_optimizer
from human_body_reconstruction_tpu.train.step import loss_fn, sample_ray_batch
from human_body_reconstruction_tpu.utils.config import PipelineConfig

SCENE_AXIS = "data"  # reuse the 1-D mesh axis: scenes shard like data


def init_multi_params(key, cfg: PipelineConfig, num_scenes: int):
    """Per-scene params stacked on a leading axis."""
    def one(k):
        k1, k2 = jax.random.split(k)
        p = {**he.init_encoder(k1, cfg.hash),
             "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                       cfg.dir_enc.out_dim)}
        if cfg.render.use_sdf:
            p["var"] = mlp_lib.init_var_model()
        return p
    return jax.vmap(one)(jax.random.split(key, num_scenes))


def init_multi_occ(num_scenes: int, resolution: int = 128,
                   threshold: float = 0.01):
    """Per-scene occupancy grids stacked on a leading axis."""
    from human_body_reconstruction_tpu.ops import occupancy

    g = occupancy.init_grid(resolution, threshold)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_scenes,) + jnp.shape(x)), g)


@functools.partial(jax.jit, static_argnames=("cfg", "num_cells"))
def update_multi_occ(occ, params, scenes, key, cfg: PipelineConfig,
                     num_cells: int = 2 ** 16):
    """One culling round per scene, vmapped (each scene's grid sees its
    own field)."""
    from human_body_reconstruction_tpu.models import nerf
    from human_body_reconstruction_tpu.ops import occupancy

    num_scenes = jax.tree_util.tree_leaves(occ)[0].shape[0]

    def one(o, p, scene, k):
        return occupancy.update(
            o, lambda pts: nerf.density_only(p, scene, pts, cfg),
            k, scene["mu"], scene["sigma"], num_cells=num_cells)

    return jax.vmap(one)(occ, params, scenes,
                         jax.random.split(key, num_scenes))


def create_multi_state(params, cfg: PipelineConfig, total_steps: int,
                       occ=None):
    tx = make_optimizer(cfg.train, total_steps, params)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      opt_state=tx.init(params), occ=occ), tx


def make_multi_train_step(cfg: PipelineConfig, tx, batch_per_scene: int,
                          mesh: Mesh | None = None):
    """Build a jitted step over stacked (params, scenes, images, c2ws, Ks).

    With ``mesh`` given, the scene axis of every stacked input is sharded
    over it (requires num_scenes % mesh.size == 0); otherwise runs on one
    device.
    """
    compute_dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                     else None)

    def per_scene_grads(params, scene, images, c2ws, K, key, occ, step):
        k_batch, k_render = jax.random.split(jax.random.fold_in(key, step))
        batch = sample_ray_batch(k_batch, images, c2ws, K, batch_per_scene)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, scene, batch, k_render, cfg, occ, compute_dtype,
            step=step)
        return grads, {"loss": loss, **aux}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, scenes, images, c2ws, Ks, keys):
        # occupancy grids (when present) are stacked per scene and ride
        # the same vmap — culling + compaction work exactly as in the
        # single-scene path
        occ_axis = None if state.occ is None else 0
        grads, metrics = jax.vmap(
            per_scene_grads, in_axes=(0, 0, 0, 0, 0, 0, occ_axis, None))(
                state.params, scenes, images, c2ws, Ks, keys, state.occ,
                state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, occ=state.occ),
                jax.tree.map(jnp.mean, metrics))

    if mesh is None:
        return step

    scene_sharded = NamedSharding(mesh, P(SCENE_AXIS))

    def placed_step(state, scenes, images, c2ws, Ks, keys):
        args = jax.tree.map(
            lambda x: jax.device_put(x, scene_sharded)
            if hasattr(x, "ndim") and x.ndim >= 1 else x,
            (scenes, images, c2ws, Ks, keys))
        return step(state, *args)

    return placed_step


def shard_multi_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the stacked state with the scene axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(SCENE_AXIS))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return x

    return jax.tree.map(put, state)
