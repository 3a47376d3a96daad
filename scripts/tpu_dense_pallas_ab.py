"""Round-4 chip A/B: fused dense-level Pallas kernel vs the XLA path.

encode_micro_r4.json measured the dense coarse levels (G=18, 34) at
31.9 ms of a 169 ms flagship step — HBM traffic on the materialised
(block, G^2) pair-weight operand.  ops/dense_pallas.py rebuilds it in
VMEM and folds the third axis in-kernel.  This measures, interleaved in
one process (drift rule, CLAUDE.md):

  chk           on-chip correctness: fwd + grid-grad max rel err vs XLA
  enc_xla/enc_pallas    scan8 dense encode f+b alone at N = 1.05M
  step_xla/step_pallas  the full flagship train step (B=32k, K=32,
                        scan8) with dense_impl flipped

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_dense_pallas_ab.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import optax


def main():
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import dense_grid, dense_pallas
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    B, S, K = 32768, 128, 32
    N = 32768 * 32
    results = {}

    base_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                             variant="cp", cp_rank=21, cp_impl="pallas")
    base_hash = dataclasses.replace(
        base_hash, dense_levels=dense_grid.auto_dense_levels(base_hash))
    print("dense grid sizes:", dense_grid.dense_grid_sizes(base_hash),
          flush=True)

    grids = dense_grid.init_dense(jax.random.PRNGKey(0), base_hash)
    mu, sigma = jnp.zeros(3), jnp.float32(1.0)

    # ---- correctness on chip (small N, one compile each way)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (8192, 3)) * 1.2 - 0.1
    d_out = base_hash.dense_levels * base_hash.features_per_level
    w = jax.random.normal(jax.random.PRNGKey(2), (8192, d_out))

    def loss_of(fn):
        @jax.jit
        def f(grids):
            out = fn(grids, xs, mu, sigma, base_hash)
            return jnp.sum(out * w), out
        return jax.grad(f, has_aux=True)

    cases = {}

    def chk():
        gx, ox = loss_of(dense_grid.dense_encode)(grids)
        gp, op = loss_of(dense_pallas.dense_encode_pallas)(grids)
        sc_o = float(jnp.max(jnp.abs(ox))) + 1e-9
        err_o = float(jnp.max(jnp.abs(ox - op))) / sc_o
        errs_g = []
        for a, b in zip(gx, gp):
            sc = float(jnp.max(jnp.abs(a))) + 1e-9
            errs_g.append(float(jnp.max(jnp.abs(a - b.astype(a.dtype))))
                          / sc)
        results["chk"] = dict(fwd_rel=round(err_o, 5),
                              grad_rel=[round(e, 5) for e in errs_g])
        print("chk:", results["chk"], flush=True)
        assert err_o < 3e-2 and max(errs_g) < 5e-2

    # ---- encode-only scan8 at flagship N
    xe_big = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))

    def make_enc(fn):
        @jax.jit
        def run(grids, x):
            def body(c, i):
                def loss(grids):
                    out = fn(grids, x + i * 1e-5, mu, sigma, base_hash)
                    return jnp.sum(out * out)
                v, g = jax.value_and_grad(loss)(grids)
                return c + v + jnp.sum(g[0][0, 0, 0, 0].astype(jnp.float32)), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
            return out
        return lambda: float(run(grids, xe_big))

    cases["enc_xla"] = make_enc(dense_grid.dense_encode)
    cases["enc_pallas"] = make_enc(dense_pallas.dense_encode_pallas)

    # ---- full flagship step
    render = C.RenderConfig(num_samples=S, occupancy=True,
                            occupancy_resolution=128,
                            compact_samples=K, occ_guided=True,
                            occ_probes=64, occ_stratified=True)
    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"],
                                   ds["c2ws"], ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    occ_grid = occupancy.init_grid(128, threshold=0.5)
    for k in range(4):
        occ_grid = occupancy.update(
            occ_grid, lambda p: synthetic.blob_field(p)[1],
            jax.random.PRNGKey(k), scene["mu"], scene["sigma"],
            num_cells=128 ** 3)

    def make_step(dense_impl):
        cfgh = dataclasses.replace(base_hash, dense_impl=dense_impl)
        cfg = C.PipelineConfig(hash=cfgh, render=render,
                               train=C.TrainConfig(ray_batch=B))
        params = {**he.init_encoder(jax.random.PRNGKey(0), cfg.hash),
                  "mlp": mlp_lib.init_mlp3d(
                      jax.random.PRNGKey(1), cfg.mlp, cfg.hash.out_dim,
                      cfg.dir_enc.out_dim)}
        occ_local = jax.tree.map(jnp.copy, occ_grid)
        state, tx = state_lib.create_train_state(params, cfg.train,
                                                 1000, occ=occ_local)
        holder = {"state": state}

        def run():
            holder["state"], m = step_lib.train_step_multi(
                holder["state"], scene, ds["images"], ds["c2ws"], ds["K"],
                jax.random.PRNGKey(0), cfg, tx, B, 8)
            return float(m["loss"])
        return run

    cases["step_xla"] = make_step("xla")
    cases["step_pallas"] = make_step("pallas")

    print("running chk ...", flush=True)
    for attempt in range(3):
        try:
            chk()
            break
        except Exception as e:
            print(f"  chk attempt {attempt} failed: {e!r}"[:300],
                  flush=True)
            time.sleep(180)

    warm = {}
    for name, run in cases.items():
        print(f"compiling {name} ...", flush=True)
        for attempt in range(3):
            try:
                run()
                run()
                warm[name] = run
                break
            except Exception as e:
                print(f"  {name} attempt {attempt} failed: {e!r}"[:300],
                      flush=True)
                time.sleep(180)
        else:
            results[name] = dict(error="failed after retries")

    times = {n: [] for n in warm}
    for rnd_i in range(3):
        for name, run in warm.items():
            t0 = time.perf_counter()
            run()
            times[name].append((time.perf_counter() - t0) / 8)
        print(f"round {rnd_i}: " + " | ".join(
            f"{n} {times[n][-1]*1e3:.1f}ms" for n in warm), flush=True)

    for name in warm:
        ms = min(times[name]) * 1e3
        results[name] = dict(ms_per_step=round(ms, 2))
        if name.startswith("step"):
            results[name]["rays_per_s"] = round(B / (ms / 1e3), 1)

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("dense_pallas_ab_r4.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
