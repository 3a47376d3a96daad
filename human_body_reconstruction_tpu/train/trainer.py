"""High-level trainer: wires data, model, optimizers, occupancy updates,
periodic eval renders, checkpointing and metrics.

The structured replacement for the reference's script-body training loop
(train_hash2.py:193-306): same capabilities (periodic test render to
``results/``, checkpoint save, resume, SDF mode, hierarchical flag) plus
working occupancy culling, per-step PSNR/rays-per-sec metrics and exact
optimizer-state resume.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from human_body_reconstruction_tpu.models import mlp as mlp_lib
from human_body_reconstruction_tpu.models import nerf
from human_body_reconstruction_tpu.ops import hash_encoding as he
from human_body_reconstruction_tpu.ops import occupancy, rays as rays_lib
from human_body_reconstruction_tpu.train import checkpoint as ckpt_lib
from human_body_reconstruction_tpu.train import state as state_lib
from human_body_reconstruction_tpu.train import step as step_lib
from human_body_reconstruction_tpu.utils.config import PipelineConfig


def _probe_loss(params, scene, ds, key, cfg, occ):
    """Small forward for gradient-norm diagnostics."""
    from human_body_reconstruction_tpu.train.step import (loss_fn,
                                                          sample_ray_batch)

    batch = sample_ray_batch(key, ds["images"], ds["c2ws"], ds["K"], 256)
    loss, _ = loss_fn(params, scene, batch, key, cfg, occ, None)
    return loss


def init_params(key, cfg: PipelineConfig):
    k1, k2 = jax.random.split(key)
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    if cfg.render.use_sdf:
        params["var"] = mlp_lib.init_var_model()
    return params


def scene_from_dataset(ds, cfg: PipelineConfig):
    """Bounds -> (scene dict).  "diagonal": mu = min bound, sigma =
    diagonal norm (reference train_hash2.py:114-119); "unit_box":
    per-axis scale for full hash-range utilisation."""
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   cfg.render.near, cfg.render.far)
    if cfg.render.normalization == "unit_box":
        sigma = jnp.maximum(hi - lo, 1e-6)
    else:
        sigma = jnp.sqrt(jnp.sum((hi - lo) ** 2))
    return {"mu": lo, "sigma": sigma, "min_bound": lo, "max_bound": hi}


@dataclasses.dataclass
class Trainer:
    cfg: PipelineConfig
    ds: dict
    out_dir: str = "results"
    model_name: str = "default"
    bounds_path: str = "bounds_model.npy"
    log_fn: Callable[[str], None] = print
    write_metrics: bool = True     # CSV/JSONL via MetricsLogger
    log_grad_norms: bool = False   # per-group grad norms (plot_grad_flow
                                   # capability, reference helper.py:239)
    eval_ds: Optional[dict] = None  # held-out views (reference evals on
                                    # transforms_tmp.json, train_hash2.py:57)
    total_steps: Optional[int] = None  # cosine-schedule horizon; defaults
                                       # to num_epochs * steps-per-epoch
    data_parallel: bool = False        # shard the ray batch over all
                                       # devices (1-D mesh, pmean grads)
    level_parallel: int = 0            # shard the hash table's level
                                       # axis over this many chips
                                       # (parallel/level_parallel.py);
                                       # composes with data_parallel on
                                       # a 2-D (data, level) mesh using
                                       # the remaining devices
    display: bool = False              # live preview of eval renders
                                       # (reference train_hash2.py:247-268
                                       # cv2 window): every eval render
                                       # also overwrites <model>_preview.png
                                       # and, when cv2 + a display exist,
                                       # shows a non-blocking window
    aot_cache: Optional[str] = None    # disk-backed compiled-executable
                                       # cache (utils/aot.py): skips the
                                       # minutes-long remote compile on
                                       # re-runs with an identical HLO;
                                       # also settable via HBR_AOT_CACHE
    steps_per_call: int = 1            # fuse this many optimizer steps
                                       # into ONE dispatch (lax.scan,
                                       # step_lib.train_step_multi):
                                       # amortizes per-dispatch/sync
                                       # overhead (~35 ms through the
                                       # remote tunnel). Occupancy
                                       # refresh / log / eval cadences
                                       # fire on boundary CROSSINGS so
                                       # any cadence works; the culling
                                       # install lands on the first
                                       # chunk boundary >= warmup (up to
                                       # steps_per_call-1 late). Works on
                                       # the dp/lp mesh paths too (the
                                       # scan wraps the shard_map).

    def __post_init__(self):
        cfg = self.cfg
        os.makedirs(self.out_dir, exist_ok=True)
        self.scene = scene_from_dataset(self.ds, cfg)
        ckpt_lib.save_bounds(
            os.path.join(self.out_dir, self.bounds_path),
            self.scene["min_bound"], self.scene["max_bound"])
        self.params = init_params(jax.random.PRNGKey(cfg.train.seed), cfg)
        occ = (occupancy.init_grid(cfg.render.occupancy_resolution,
                                   threshold=cfg.render.occ_threshold)
               if cfg.render.occupancy else None)
        # occupancy warmup: train unculled first; the grid is installed
        # (and immediately refreshed from the field) at warmup
        self._occ_pending = None
        if occ is not None and cfg.train.occ_warmup_steps > 0:
            self._occ_pending = occ
            occ = None
        if self.total_steps is None:
            self.total_steps = cfg.train.num_epochs * max(
                1, (self.ds["images"].size // 3) // cfg.train.ray_batch)
        self.state, self.tx = state_lib.create_train_state(
            self.params, cfg.train, self.total_steps, occ=occ)
        self.mesh = None
        self._dp_step = None
        self._dp_step1 = None   # single-step variant for remainder chunks
        self._lp = None
        spc = max(1, self.steps_per_call)
        if self.level_parallel > 1:
            from human_body_reconstruction_tpu.parallel import (
                level_parallel as lp)

            self._lp = lp
            n_level = self.level_parallel
            n_data = (len(jax.devices()) // n_level
                      if self.data_parallel else 1)
            self.mesh = lp.make_lp_mesh(max(n_data, 1), n_level)
            self._dp_step = lp.make_lp_train_step(
                cfg, self.tx, cfg.train.ray_batch, self.mesh,
                steps_per_call=spc)
            if spc > 1:
                self._dp_step1 = lp.make_lp_train_step(
                    cfg, self.tx, cfg.train.ray_batch, self.mesh)
            self.state = lp.shard_lp_state(self.state, self.mesh)
            self._lp_renders = {}
            self.log_fn(
                f"level-parallel over {self.mesh.shape['level']} chips"
                + (f" x {self.mesh.shape['data']} data shards"
                   if self.mesh.shape['data'] > 1 else ""))
        elif self.data_parallel and len(jax.devices()) > 1:
            from human_body_reconstruction_tpu.parallel import (
                data_parallel as dp)

            self.mesh = dp.make_mesh()
            self._dp_step = dp.make_dp_train_step(
                cfg, self.tx, cfg.train.ray_batch, self.mesh,
                steps_per_call=spc)
            if spc > 1:
                self._dp_step1 = dp.make_dp_train_step(
                    cfg, self.tx, cfg.train.ray_batch, self.mesh)
            self.state = dp.replicate_to_mesh(self.state, self.mesh)
            self.log_fn(f"data-parallel over {self.mesh.devices.size} "
                        "devices")
        self._step_fn = step_lib.train_step
        self._multi_fn = step_lib.train_step_multi
        self._render_fn = None
        cache_dir = self.aot_cache or os.environ.get("HBR_AOT_CACHE")
        if cache_dir and self._dp_step is None:
            from human_body_reconstruction_tpu.utils import aot

            self._aot = aot.AOTCache(cache_dir)
            self._step_fn = aot.CachedJit(
                step_lib.train_step, self._aot,
                static_argnames=("cfg", "tx", "batch_size"))
            self._multi_fn = aot.CachedJit(
                step_lib.train_step_multi, self._aot,
                static_argnames=("cfg", "tx", "batch_size", "n_steps"))
            self._render_fn = aot.CachedJit(
                step_lib.render_chunk, self._aot,
                static_argnames=("cfg", "num_samples", "hierarchical"))
            self.log_fn(f"aot executable cache at {self._aot.dir}")
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.history = []
        from human_body_reconstruction_tpu.utils.observability import (
            MetricsLogger)

        self.metrics = MetricsLogger(
            out_dir=self.out_dir if self.write_metrics else None,
            name=f"{self.model_name}_metrics", stdout=False)

    # -- checkpointing ----------------------------------------------------
    def ckpt_path(self):
        return os.path.join(self.out_dir, f"{self.model_name}_ckpt.npz")

    def save(self):
        ckpt_lib.save_train_state(self.ckpt_path(), self.state)
        from human_body_reconstruction_tpu.utils import config as C

        C.to_json(self.cfg, os.path.join(
            self.out_dir, f"{self.model_name}_config.json"))

    def load(self, path: Optional[str] = None):
        self.state = ckpt_lib.load_train_state(
            path or self.ckpt_path(), self.state,
            allow_occ=self.cfg.render.occupancy)
        if self.state.occ is not None:
            self._occ_pending = None   # resumed with a live grid
        if self._lp is not None:       # restore the level sharding
            self.state = self._lp.shard_lp_state(self.state, self.mesh)

    # -- occupancy --------------------------------------------------------
    def _install_occ(self, step_no: int):
        """End of warmup: attach the grid and refresh it from the (now
        trained) field so the first culling decision is informed."""
        self.state = self.state._replace(occ=self._occ_pending)
        self._occ_pending = None
        if self.mesh is not None:
            from human_body_reconstruction_tpu.parallel import (
                data_parallel as dp)

            self.state = self.state._replace(
                occ=dp.replicate_to_mesh(self.state.occ, self.mesh))
        self.update_occupancy(step_no)
        self.log_fn(f"occupancy culling engaged at step {step_no}")

    def update_occupancy(self, step_no: Optional[int] = None):
        if self.state.occ is None:
            return
        cfg = self.cfg
        if step_no is None:
            step_no = int(self.state.step)

        params_now = self.state.params
        if self._lp is not None:
            # the refresh runs outside the lp shard_map: gather the level
            # shards into a replicated table first (one all_gather per
            # refresh; the eager mixed-sharding path aborts the runtime)
            params_now = jax.device_put(
                params_now,
                jax.sharding.NamedSharding(self.mesh,
                                           jax.sharding.PartitionSpec()))

        # fully-jitted refresh: ONE dispatch instead of an eager op chain
        # (through the remote tunnel each eager op costs ~35 ms; at the
        # 15-step default cadence the eager refresh dominated training)
        occ = occupancy.update_from_field(
            self.state.occ, params_now, self.scene,
            jax.random.fold_in(self.key, 10_000 + step_no), cfg)
        self.state = self.state._replace(occ=occ)

    # -- training ---------------------------------------------------------
    def run(self, steps: int, log_every: int = 100,
            eval_every: Optional[int] = None, eval_pose: int = 0,
            eval_samples: int = 256):
        cfg = self.cfg
        t_last = time.perf_counter()
        rays_done = 0
        # host-side step counter: int(self.state.step) per iteration is a
        # device->host sync that serializes the step pipeline
        start_step = int(self.state.step)
        spc = max(1, self.steps_per_call)

        def crossed(upto: int, n: int, every: int) -> bool:
            """Did [upto-n, upto] cross a multiple of ``every``?"""
            return every > 0 and upto // every > (upto - n) // every

        i = 0
        while i < steps:
            # also covers resume-past-warmup at i=0
            if self._occ_pending is not None and (
                    start_step + i >= cfg.train.occ_warmup_steps):
                self._install_occ(start_step + i)
            n = min(spc, steps - i)
            if self._dp_step is not None:
                # the fused dp/lp step has a FIXED window; remainder
                # chunks (steps % spc) run the single-step variant
                fn = self._dp_step if n == spc else self._dp_step1
                for _ in range(1 if n == spc else n):
                    self.state, metrics = fn(
                        self.state, self.scene, self.ds["images"],
                        self.ds["c2ws"], self.ds["K"], self.key)
            elif n > 1:
                self.state, metrics = self._multi_fn(
                    self.state, self.scene, self.ds["images"],
                    self.ds["c2ws"], self.ds["K"], self.key, cfg=cfg,
                    tx=self.tx, batch_size=cfg.train.ray_batch, n_steps=n)
            else:
                # statics by keyword: required by the CachedJit contract,
                # accepted identically by the plain jitted fn
                self.state, metrics = self._step_fn(
                    self.state, self.scene, self.ds["images"],
                    self.ds["c2ws"], self.ds["K"], self.key, cfg=cfg,
                    tx=self.tx, batch_size=cfg.train.ray_batch)
            rays_done += cfg.train.ray_batch * n
            i += n

            step_no = start_step + i
            if cfg.render.occupancy and crossed(step_no, n,
                                                cfg.train.update_rate):
                self.update_occupancy(step_no)

            if log_every and crossed(i, n, log_every):
                jax.block_until_ready(metrics["loss"])
                dt = time.perf_counter() - t_last
                rps = rays_done / dt
                rec = {"step": step_no,
                       "loss": float(metrics["loss"]),
                       "psnr": float(metrics["psnr"]),
                       "rays_per_sec": rps}
                if self.state.occ is not None:
                    rec["occupied_frac"] = float(
                        occupancy.occupied_fraction(self.state.occ))
                if self.log_grad_norms:
                    from human_body_reconstruction_tpu.utils import (
                        observability as obs)

                    g = jax.grad(_probe_loss)(self.state.params, self.scene,
                                              self.ds, self.key, cfg,
                                              self.state.occ)
                    rec.update({k: float(v)
                                for k, v in obs.grad_norms(g).items()})
                self.history.append(rec)
                self.metrics.log(rec)
                self.log_fn(
                    f"step {rec['step']:7d}  loss {rec['loss']:.5f}  "
                    f"psnr {rec['psnr']:6.2f}  {rps/1e6:7.3f} Mrays/s")
                t_last = time.perf_counter()
                rays_done = 0

            if eval_every and crossed(i, n, eval_every):
                self.eval_render(eval_pose, eval_samples,
                                 tag=f"{step_no:07d}")
                self.save()
        return self.state

    def eval_render(self, pose_idx: int = 0, num_samples: int = 256,
                    tag: str = "final", write_png: bool = True):
        """Render a full test view; write PNG + return PSNR vs the
        dataset image (reference writes min-max-normalised PNGs to
        ./results, train_hash2.py:297; we write the raw [0,1] clip and
        log true PSNR)."""
        cfg = self.cfg
        ds = self.eval_ds if self.eval_ds is not None else self.ds
        render_fn = self._render_fn
        if self._lp is not None:
            render_fn = self._lp_render_fn(num_samples,
                                           cfg.render.hierarchical)
        img = step_lib.render_image(
            self.state.params, self.scene, ds["H"], ds["W"],
            ds["K"], ds["c2ws"][pose_idx], cfg,
            occ=self.state.occ, num_samples=num_samples,
            hierarchical=cfg.render.hierarchical,
            render_fn=render_fn)
        gt = np.asarray(ds["images"][pose_idx])
        mse = float(np.mean((img - gt) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        arr8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if write_png:
            from PIL import Image

            path = os.path.join(self.out_dir,
                                f"{self.model_name}_{tag}.png")
            Image.fromarray(arr8).save(path)
        if self.display:
            self._show_preview(arr8)
        self.log_fn(f"eval [{tag}] pose {pose_idx}: PSNR {psnr:.2f} dB")
        return psnr

    def _lp_render_fn(self, num_samples: int, hierarchical: bool):
        """Chunk-renderer over the (data, level) mesh, memoized per
        static config; signature-compatible with render_image's
        ``render_fn`` hook (cfg/num_samples/hierarchical are baked)."""
        key2 = (num_samples, hierarchical)
        if key2 not in self._lp_renders:
            r = self._lp.make_lp_render(self.cfg, self.mesh,
                                        num_samples=num_samples,
                                        hierarchical=hierarchical)
            self._lp_renders[key2] = (
                lambda params, scene, o, d, n, key, occ=None, **_:
                r(params, scene, o, d, n, key, occ))
        return self._lp_renders[key2]

    def _show_preview(self, arr8):
        """Rolling live preview: overwrite <model>_preview.png every eval
        and show a non-blocking cv2 window when a display is available
        (reference train_hash2.py:247-268 --display)."""
        from PIL import Image

        Image.fromarray(arr8).save(
            os.path.join(self.out_dir, f"{self.model_name}_preview.png"))
        try:
            import cv2

            if os.environ.get("DISPLAY") or os.name == "nt":
                cv2.imshow(f"{self.model_name} preview", arr8[..., ::-1])
                cv2.waitKey(1)
        except Exception:
            pass  # headless: the rolling PNG is the preview
