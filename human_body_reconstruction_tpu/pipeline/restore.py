"""Checkpoint -> model restoration shared by the inference CLIs.

Both mesh export (cli/nerf2mesh.py) and novel-view rendering
(cli/render.py) must rebuild the exact training-time model before they
can evaluate the field.  The reference re-declares the architecture by
hand at every consumer (nerf2mesh.py:56-64 rebuilds HashEncoder + MLP_3D
from CLI flags and loads two .pth state-dicts, trusting the user to pass
matching flags); here the trainer persists ``<model_name>_config.json``
next to the checkpoint and this module restores from it, falling back to
flags only when the JSON is absent.

Restores, in one call:
  * the pipeline config (saved JSON preferred; CLI-flag reconstruction
    as fallback),
  * the scene dict from the bounds artifact (either filename spelling,
    see train/checkpoint.load_bounds),
  * the params pytree from either a bare-params checkpoint or a full
    train-state checkpoint (positional prefix load),
  * optionally the occupancy grid saved inside a train-state checkpoint
    (``extra_occ_*`` keys) so inference can reuse the trained culling
    grid.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import numpy as np

from human_body_reconstruction_tpu.utils import config as C


@dataclasses.dataclass
class Restored:
    params: Any
    scene: dict
    cfg: C.PipelineConfig
    occ: Any                   # ops.occupancy.OccupancyGrid | None
    ckpt_path: str
    cfg_source: str            # "json" | "flags"


def load_config(ckpt_dir: str, model_name: str, *,
                near: float = 2.0, far: float = 6.0,
                hierarchical: bool = False, use_sdf: bool = False,
                max_res: float = 2048, hash_size: float = 16,
                encoder_variant: Optional[str] = None,
                rgb_elu: bool = False):
    """Prefer the persisted training config (written by Trainer.save):
    it pins encoder variant / activations / table geometry exactly, so
    inference can't silently mismatch the weights.  near/far/
    hierarchical stay caller-controlled (render-time choices, not model
    identity).  Returns (cfg, source)."""
    cfg_json = os.path.join(ckpt_dir, f"{model_name}_config.json")
    if os.path.exists(cfg_json):
        saved = C.from_json(cfg_json)
        cfg = C.PipelineConfig(
            hash=saved.hash, dir_enc=saved.dir_enc, mlp=saved.mlp,
            render=dataclasses.replace(
                saved.render, near=near, far=far,
                hierarchical=hierarchical),
            train=saved.train)
        source = "json"
    else:
        cfg = C.PipelineConfig(
            hash=C.HashConfig(n_max=int(max_res),
                              log2_table_size=int(hash_size),
                              variant=encoder_variant or "corner"),
            mlp=C.MLPConfig(
                density_activation="sdf" if use_sdf else "leaky_relu",
                rgb_activation="elu" if rgb_elu else "sigmoid"),
            render=C.RenderConfig(near=near, far=far, use_sdf=use_sdf,
                                  hierarchical=hierarchical),
        )
        source = "flags"
    if encoder_variant and encoder_variant != cfg.hash.variant:
        cfg = dataclasses.replace(
            cfg, hash=dataclasses.replace(cfg.hash,
                                          variant=encoder_variant))
    return cfg, source


def scene_from_bounds(lo, hi, normalization: str = "diagonal"):
    """Same construction as Trainer.scene_from_dataset, from a persisted
    bounds artifact (reference layout: np.stack([min, max]))."""
    import jax.numpy as jnp

    lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)
    if normalization == "unit_box":
        sigma = jnp.maximum(hi_j - lo_j, 1e-6)
    else:
        sigma = jnp.sqrt(jnp.sum((hi_j - lo_j) ** 2))
    return {"mu": lo_j, "sigma": sigma,
            "min_bound": lo_j, "max_bound": hi_j}


def find_checkpoint(ckpt_dir: str, model_name: str,
                    ckpt_name: str = "N_2048_T_16") -> str:
    """Accept either the trainer's "{model_name}_ckpt.npz" or the
    reference-style "{ckpt_name}" prefix (nerf2mesh.py:21-26)."""
    candidates = [
        os.path.join(ckpt_dir, f"{model_name}_ckpt.npz"),
        os.path.join(ckpt_dir, f"{ckpt_name}_ckpt.npz"),
        f"{model_name}_ckpt.npz",
    ]
    found = next((c for c in candidates if os.path.exists(c)), None)
    if found is None:
        raise FileNotFoundError(f"no checkpoint found in {candidates}")
    return found


def load_params(ckpt_path: str, params_template):
    """Load only the params subtree from a full train-state checkpoint,
    or a bare params checkpoint."""
    import jax

    from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib

    try:
        params, _ = ckpt_lib.load_pytree(ckpt_path, params_template)
        return params
    except (ValueError, KeyError):
        pass
    # full train-state layout: (params, opt_state); leaves of params come
    # first in tree_flatten order, so load positionally.
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    with np.load(ckpt_path) as data:
        new = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for got, want in zip(new, leaves):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"checkpoint leaf shape {got.shape} does not match the "
                f"rebuilt model's {np.shape(want)} — the export config "
                "(encoder variant / table size / activations) differs from "
                "training. Pass --encoder_variant/--rgb_elu/--hash_size to "
                "match, or restore from a run directory containing "
                "<model_name>_config.json (written by the trainer).")
    return jax.tree_util.tree_unflatten(treedef, new)


def load_occ(ckpt_path: str):
    """Occupancy grid persisted inside a train-state checkpoint
    (checkpoint.save_train_state extras), or None."""
    import jax.numpy as jnp

    from human_body_reconstruction_tpu.ops.occupancy import OccupancyGrid

    with np.load(ckpt_path) as data:
        if "extra_occ_density" not in data:
            return None
        return OccupancyGrid(
            density=jnp.asarray(data["extra_occ_density"]),
            mask=jnp.asarray(data["extra_occ_mask"]),
            threshold=jnp.asarray(data["extra_occ_threshold"]))


def restore(ckpt_dir: str, model_name: str, *,
            bound_pth: str = "bounds_model.npy",
            ckpt_name: str = "N_2048_T_16",
            near: float = 2.0, far: float = 6.0,
            hierarchical: bool = False, use_sdf: bool = False,
            max_res: float = 2048, hash_size: float = 16,
            encoder_variant: Optional[str] = None, rgb_elu: bool = False,
            normalization: Optional[str] = None,
            with_occ: bool = False,
            log_fn=print) -> Restored:
    """One-call restoration of (params, scene, cfg, occ) from a run
    directory.  ``normalization=None`` uses the saved config's choice
    (or "diagonal" without one); pass explicitly to override."""
    import jax

    from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib
    from human_body_reconstruction_tpu.train import trainer as trainer_lib

    cfg, source = load_config(
        ckpt_dir, model_name, near=near, far=far,
        hierarchical=hierarchical, use_sdf=use_sdf, max_res=max_res,
        hash_size=hash_size, encoder_variant=encoder_variant,
        rgb_elu=rgb_elu)
    if source == "json":
        log_fn(f"restored model config from "
               f"{os.path.join(ckpt_dir, model_name + '_config.json')}")

    norm = normalization or (cfg.render.normalization
                             if source == "json" else "diagonal")
    bound_path = bound_pth
    if not os.path.exists(bound_path):
        bound_path = os.path.join(ckpt_dir, os.path.basename(bound_path))
    lo, hi = ckpt_lib.load_bounds(bound_path)
    scene = scene_from_bounds(lo, hi, norm)

    template = trainer_lib.init_params(jax.random.PRNGKey(0), cfg)
    ckpt_path = find_checkpoint(ckpt_dir, model_name, ckpt_name)
    params = load_params(ckpt_path, template)
    log_fn(f"loaded {ckpt_path}")
    occ = load_occ(ckpt_path) if with_occ else None
    return Restored(params=params, scene=scene, cfg=cfg, occ=occ,
                    ckpt_path=ckpt_path, cfg_source=source)
