"""Level-parallel (tensor-parallel) hash encoding over a 2-D device mesh.

The chip-level bottleneck of this whole framework is random table
lookups (~4 KB tile per lookup, docs/PERF_NOTES.md), and lookups are
proportional to the LEVEL count: sharding the stacked (L, T, F) table's
level axis across chips divides the per-chip lookup (and backward
scatter) volume by the axis extent — the lever data parallelism cannot
pull, since DP replicates every level on every chip.  It is also the
memory axis: at T = 2**22, L = 16, F = 2 the fp32 table is 512 MB and
stops fitting v5e HBM next to activations; level sharding divides it.

Layout (scaling-book recipe: pick a mesh, annotate shardings, let XLA
place the collectives):

  * 2-D mesh ("data", "level"); composes with ray data parallelism —
    rays shard over "data" exactly as in ``parallel/data_parallel.py``.
  * table: NamedSharding P("level") on the level axis; each chip holds
    L / n_level levels and their optimizer moments.  MLP + dense-grid
    params replicated.
  * forward: each chip encodes its levels for its data shard's points,
    then ONE tiled ``all_gather`` along "level" rebuilds the (N, L*F)
    feature block (level-major order is preserved because the ladder is
    sharded contiguously).  The MLP runs replicated across the level
    axis — redundant FLOPs, but the MLP is ~free next to the lookups.
  * backward: the all_gather's transpose hands each chip exactly its
    slice of the feature cotangent, so table gradients stay local (no
    collective on the table!); MLP/ray gradients ``pmean`` over "data"
    only, as in DP.
  * the per-chip level slice is described by a DYNAMIC scales vector
    (sharded operand) — the hash/trilerp math is identical, only N_l
    differs per level (ops/hash_encoding.py ``scales`` override).

The geometric ladder is closed under contiguous slicing, so each chip's
slice is itself a valid multires ladder.

Every encoder variant is supported: the exact corner/cell interpolants
shard bitwise-equivalently; the stochastic/packed/int8 training paths
fold their RNG keys by the level-axis index (each chip draws its own
per-level corner bits — distribution-equivalent, not bitwise-equal, to
the single-chip stream) and their custom VJPs scatter into the local
table slice only.  Dense coarse levels (``dense_levels`` > 0) are
replicated and computed by every level-chip (MXU-cheap); only the
hashed ladder is sharded, and ``encode_params`` all_gathers the hashed
blocks BEFORE concatenating the dense part so the MLP layout matches
the single-chip one exactly.

The CP factor-line encoder (``variant="cp"``, ops/lowrank.py) has no
lookups to divide — its cost is matmul FLOPs, proportional to the CP
rank — so under the same "level" mesh axis it shards the RANK axis
instead ("rank parallelism"): each chip holds a contiguous
(dim, G_l, R/n) rank slice of EVERY level's factor lines (plus their
adam moments), runs the identical block-diagonal-matmul encode on its
slice, and ``encode_params`` all_gathers the rank blocks and restores
the level-major/rank-minor column order before the replicated MLP.
The per-chip encode FLOPs divide by the axis extent; line gradients
stay chip-local through the all_gather transpose, exactly as for the
table.

No reference analog: the reference's parallelism is a single-process
``DataParallel`` over the MLP only (train_hash2.py:127).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.train.state import TrainState
from human_body_reconstruction_tpu.train.step import loss_fn, sample_ray_batch
from human_body_reconstruction_tpu.utils.config import PipelineConfig

DATA_AXIS = "data"
LEVEL_AXIS = "level"


def make_lp_mesh(n_data: int, n_level: int, devices=None) -> Mesh:
    """2-D (data, level) mesh; either extent may be 1."""
    devices = jax.devices() if devices is None else devices
    if n_data * n_level > len(devices):
        raise ValueError(f"mesh {n_data}x{n_level} needs more than the "
                         f"{len(devices)} visible devices")
    devices = devices[: n_data * n_level]
    return Mesh(np.asarray(devices).reshape(n_data, n_level),
                (DATA_AXIS, LEVEL_AXIS))


def _validate(cfg: PipelineConfig, mesh: Mesh, batch_size: Optional[int]):
    h = cfg.hash
    n_level = mesh.shape[LEVEL_AXIS]
    if h.variant == "cp":
        # CP shards the RANK axis (there are no lookups to divide; the
        # cost is matmul FLOPs, proportional to R)
        if h.cp_rank % n_level:
            raise ValueError(
                f"cp_rank {h.cp_rank} not divisible by the level-axis "
                f"extent {n_level} (variant='cp' shards the rank axis)")
    elif h.num_hashed_levels % n_level:
        raise ValueError(
            f"hashed level count {h.num_hashed_levels} not divisible by "
            f"the level-axis extent {n_level} (dense levels are "
            "replicated; only the hashed ladder shards)")
    if batch_size is not None and batch_size % mesh.shape[DATA_AXIS]:
        raise ValueError(f"batch_size {batch_size} not divisible by the "
                         f"data-axis extent {mesh.shape[DATA_AXIS]}")


def _lp_cfg(cfg: PipelineConfig) -> PipelineConfig:
    return dataclasses.replace(
        cfg, hash=dataclasses.replace(cfg.hash, level_axis=LEVEL_AXIS))


def _params_spec(params):
    """Pytree-prefix spec: the hash table shards on its level axis, CP
    factor lines on their (trailing) rank axis, rest replicated."""
    spec = {}
    for k in params:
        if k == "table":
            spec[k] = P(LEVEL_AXIS)
        elif k == "lines":
            spec[k] = P(None, None, LEVEL_AXIS)
        else:
            spec[k] = P()
    return spec


def _param_key_in_path(path, name: str) -> bool:
    return any(getattr(k, "key", None) == name for k in path)


def shard_lp_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh: every level-shaped leaf reached
    through a "table" key (params AND optimizer moments) sharded
    P("level"), every CP factor line reached through a "lines" key
    sharded on its trailing RANK axis, everything else (incl. scalar opt
    bookkeeping that optax masks key by param name) replicated."""
    n_level = mesh.shape[LEVEL_AXIS]

    def put(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        if (_param_key_in_path(path, "table") and ndim >= 1
                and leaf.shape[0] % n_level == 0):
            spec = P(LEVEL_AXIS)
        elif (_param_key_in_path(path, "lines") and ndim >= 1
                and leaf.shape[-1] % n_level == 0):
            spec = P(*([None] * (ndim - 1)), LEVEL_AXIS)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, state)


def level_scales_array(cfg: PipelineConfig):
    """The HASHED ladder only — the sharded axis (dense levels derive
    their scales statically on every chip)."""
    return jnp.asarray(
        he.level_scales(cfg.hash)[cfg.hash.dense_levels:], jnp.float32)


def make_lp_train_step(cfg: PipelineConfig, tx, batch_size: int, mesh: Mesh,
                       steps_per_call: int = 1):
    """Jitted level+data-parallel train step, same call signature and
    semantics as ``train.step.train_step`` (global ray batch per call).
    ``steps_per_call`` > 1 fuses that many optimizer steps into one
    dispatch (``lax.scan``) and returns window-mean metrics."""
    _validate(cfg, mesh, batch_size)
    cfg_lp = _lp_cfg(cfg)
    n_data = mesh.shape[DATA_AXIS]
    local_batch = batch_size // n_data
    compute_dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                     else None)
    scales_full = level_scales_array(cfg)

    def shard_fn(params, occ, scene, images, c2ws, K, key, step,
                 scales_local):
        axis_d = jax.lax.axis_index(DATA_AXIS)
        # all level-chips of one data shard MUST draw identical rays —
        # fold the data index only
        k = jax.random.fold_in(jax.random.fold_in(key, step), axis_d)
        k_batch, k_render = jax.random.split(k)
        batch = sample_ray_batch(k_batch, images, c2ws, K, local_batch)

        def wrapped(p):
            p = dict(p)
            p["lp_scales"] = scales_local  # placement data, not a param
            return loss_fn(p, scene, batch, k_render, cfg_lp, occ,
                           compute_dtype, step=step)

        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(
            params)
        # table grads are already exactly local (the all_gather transpose
        # routes each chip its own slice's cotangent); reduce over rays
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        aux = jax.tree.map(lambda a: jax.lax.pmean(a, DATA_AXIS), aux)
        return grads, loss, aux

    # cp ignores the per-chip scales (its levels aren't sharded); the
    # hashed variants slice the ladder across the level axis
    scales_spec = P() if cfg.hash.variant == "cp" else P(LEVEL_AXIS)

    def build(params):
        spec = _params_spec(params)
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(spec, P(), P(), P(), P(), P(), P(), P(),
                      scales_spec),
            out_specs=(spec, P(), P()),
            check_vma=False)

    def one_step(state, scene, images, c2ws, K, key):
        grads, loss, aux = build(state.params)(
            state.params, state.occ, scene, images, c2ws, K, key,
            state.step, scales_full)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, occ=state.occ)
        return new_state, {"loss": loss, **aux}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, scene, images, c2ws, K, key):
        if steps_per_call <= 1:
            return one_step(state, scene, images, c2ws, K, key)

        def body(st, _):
            return one_step(st, scene, images, c2ws, K, key)

        st, metrics = jax.lax.scan(body, state, length=steps_per_call)
        return st, jax.tree.map(lambda x: jnp.mean(x, axis=0), metrics)

    return step


def make_lp_render(cfg: PipelineConfig, mesh: Mesh, num_samples: int = 128,
                   hierarchical: bool = False, compute_dtype=None):
    """Jitted eval render: rays shard over "data", table over "level".

    render(params, scene, rays_o, rays_d, dir_norm, key) -> (N, 3); the
    global ray count must divide the data-axis extent.
    """
    _validate(cfg, mesh, None)
    cfg_lp = _lp_cfg(cfg)
    from human_body_reconstruction_tpu.models import nerf
    scales_full = level_scales_array(cfg)

    def shard_fn(params, scene, rays_o, rays_d, dir_norm, key, occ,
                 scales_local):
        p = dict(params)
        p["lp_scales"] = scales_local
        out = nerf.render_rays(p, scene, rays_o, rays_d, dir_norm, key,
                               cfg_lp, num_samples=num_samples,
                               hierarchical=hierarchical, jitter=False,
                               occ=occ, compute_dtype=compute_dtype)
        return out["fine"]

    scales_spec = P() if cfg.hash.variant == "cp" else P(LEVEL_AXIS)

    def build(params):
        spec = _params_spec(params)
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(spec, P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                      P(), P(), scales_spec),
            out_specs=P(DATA_AXIS), check_vma=False)

    @jax.jit
    def render(params, scene, rays_o, rays_d, dir_norm, key, occ=None):
        return build(params)(params, scene, rays_o, rays_d, dir_norm, key,
                             occ, scales_full)

    return render
