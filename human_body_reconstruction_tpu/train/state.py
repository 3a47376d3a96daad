"""Training state: optax optimizers, schedules, checkpointable pytrees.

Mirrors the reference's dual-optimizer setup (train_hash2.py:141-162):
  * Adam(lr 0.05) on the hash table,
  * AdamW(lr 0.005) on the MLP,
  * both cosine-annealed to lr_final=1e-4 over the total step budget
    (CosineAnnealingLR eta_min, train_hash2.py:156-162),
  * optional third AdamW(lr 0.01) on the SDF sharpness parameter
    (train_hash2.py:164-170).

Implemented as a single ``optax.multi_transform`` over the param pytree so
one ``opt.update`` drives all groups inside one jit.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from human_body_reconstruction_tpu.ops import occupancy
from human_body_reconstruction_tpu.utils.config import TrainConfig


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    occ: Optional[occupancy.OccupancyGrid] = None


def cosine_to_floor(lr: float, lr_final: float, total_steps: int):
    """CosineAnnealingLR with eta_min: lr_final + 0.5*(lr-lr_final)*(1+cos)."""
    def sched(step):
        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return lr_final + 0.5 * (lr - lr_final) * (1 + jnp.cos(jnp.pi * frac))
    return sched


def _make_schedule(cfg: TrainConfig, lr: float, total_steps: int):
    if cfg.schedule == "onecycle":
        # reference train_hash.py:133-142 / test_hash.py:113-122 use
        # OneCycleLR with cosine annealing
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1), peak_value=lr)
    return cosine_to_floor(lr, cfg.lr_final, total_steps)


def make_optimizer(cfg: TrainConfig, total_steps: int, params):
    """Build the grouped optimizer for a hash-NeRF param pytree
    {"table": ..., "mlp": ...[, "var": ...]}."""
    tx_table = optax.adam(
        learning_rate=_make_schedule(cfg, cfg.lr_hash, total_steps),
        eps=1e-15)
    tx_mlp = optax.adamw(
        learning_rate=_make_schedule(cfg, cfg.lr_mlp, total_steps),
        weight_decay=cfg.weight_decay)
    transforms = {"table": tx_table, "mlp": tx_mlp}
    if "dense" in params:
        # dense coarse-level grids are embeddings like the hash table:
        # same Adam + schedule treatment (reference train_hash2.py:141)
        transforms["dense"] = optax.adam(
            learning_rate=_make_schedule(cfg, cfg.lr_hash, total_steps),
            eps=1e-15)
    if "lines" in params:
        # CP factor lines (ops/lowrank.py): embedding-like, same Adam +
        # schedule as the hash table
        transforms["lines"] = optax.adam(
            learning_rate=_make_schedule(cfg, cfg.lr_hash, total_steps),
            eps=1e-15)
    if "var" in params:
        transforms["var"] = optax.adamw(learning_rate=cfg.lr_var)

    def labeler(p):
        return jax.tree.map_with_path(lambda path, _: path[0].key, p)

    return optax.multi_transform(transforms, labeler)


def create_train_state(params, cfg: TrainConfig, total_steps: int,
                       occ: Optional[occupancy.OccupancyGrid] = None):
    tx = make_optimizer(cfg, total_steps, params)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      opt_state=tx.init(params), occ=occ), tx
