"""Benchmark: hash-NeRF training throughput on the attached TPU chip.

Measures the north-star metric (BASELINE.md): training rays/sec at
128 samples/ray with the reference-default model (L=16 levels, T=2^16
hash table, 16k-ray batches, coarse pass) — the full fused train step
including on-device ray generation, hash encode, MLP, compositing, loss,
backward and both optimizer updates.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 5e6 (the ">= 5M rays/sec/chip" target).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    batch = 32768
    num_samples = 128
    compact = 48
    # TPU-tuned training configuration: unbiased stochastic-corner hash
    # sampling with packed bf16-pair gathers (the per-lookup tile cost of
    # TPU random access dominates this workload, docs/PERF_NOTES.md) plus
    # occupancy culling with static sample compaction — the steady-state
    # training mode once the culling grid has converged on the scene
    # (the Instant-NGP operating point).  Eval renders use the exact
    # interpolant.
    cfg = C.PipelineConfig(
        hash=C.HashConfig(stochastic_train=True, packed=True,
                          grad_subsample=True, hw_rng=True),
        render=C.RenderConfig(num_samples=num_samples, occupancy=True,
                              occupancy_resolution=128,
                              compact_samples=compact),
        train=C.TrainConfig(ray_batch=batch),
    )

    # Small synthetic dataset (images only feed gt-pixel gathers; their
    # size does not affect the per-ray compute being measured).
    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "table": he.init_table(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }

    # Converged occupancy grid for the scene, from its analytic density
    # (what the trainer's periodic updates converge to).
    from human_body_reconstruction_tpu.ops import occupancy

    occ = occupancy.init_grid(cfg.render.occupancy_resolution,
                              threshold=0.5)
    for k in range(4):
        occ = occupancy.update(
            occ, lambda p: synthetic.blob_field(p)[1],
            jax.random.PRNGKey(k), scene["mu"], scene["sigma"],
            num_cells=cfg.render.occupancy_resolution ** 3)
    occ_frac = float(occupancy.occupied_fraction(occ))

    state, tx = state_lib.create_train_state(params, cfg.train, 1000,
                                             occ=occ)
    key = jax.random.PRNGKey(0)

    def run_step(state):
        return step_lib.train_step(state, scene, ds["images"], ds["c2ws"],
                                   ds["K"], key, cfg, tx, batch)

    # Warmup / compile.  Timings force a host sync every step (through
    # the remote-execution tunnel of this environment, block_until_ready
    # alone can return before the work is actually done).
    for _ in range(3):
        state, metrics = run_step(state)
    float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = run_step(state)
        float(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": (f"train_rays_per_sec_chip@{num_samples}samples"
                   f"_occ{occ_frac:.2f}"),
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 5e6, 4),
    }))


if __name__ == "__main__":
    main()
