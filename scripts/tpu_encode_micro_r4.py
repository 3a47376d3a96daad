"""Round-4 encode micro-profile: which part of the CP encoder costs
~130 ms/step when the Pallas kernel's executed width barely matters?

The step ablation (step_ablate_r4.json) showed: step cost scales with N
(k24: -35 ms for -25% N) but NOT with the kernel's executed width
(tight layout -13.5% rows: -2 ms; short ladder -89% rows: SLOWER) —
so the dominant per-point cost sits in the XLA glue around the kernel,
not in the kernel's matmul/build.  This times each sub-component as an
8-iteration fused lax.scan (ONE dispatch + sync per number: the ~35 ms
tunnel floor amortises to ~4 ms and subtracts out in diffs), fresh x
per iteration so nothing folds.

Components at N = 32768*32 = 1.05M points (the flagship culled step):
  cp_fb          grad of sum(cp_encode_pallas^2) — the kernel + xe prep
                 + mats build + T product, full 6-level ladder
  cp_fb_short    same with a 3-level ladder (width /8): if ~equal,
                 width-independence confirmed at the encode level
  cp_fb_xla      same through the XLA lax.map path (sanity: the kernel
                 should still beat it)
  cp_fwd         forward only
  dense_fb       grad of sum(dense_encode^2) — the 2 dense coarse
                 levels (suspect: the (B, G^2) pair-weight matrix is
                 HBM-materialised per block, the exact pattern that
                 made the XLA CP encode HBM-bound)
  encp_fb        encode_params (dense + cp + concat) — the whole
                 encoder as the step sees it
  mats_only      mats construction + T product shapes without the
                 pallas_call (isolates the glue around the kernel)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_encode_micro_r4.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp


def main():
    from human_body_reconstruction_tpu.ops import cp_pallas, dense_grid, lowrank
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    N = 32768 * 32
    results = {}

    cp_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                           variant="cp", cp_rank=21, cp_impl="pallas")
    cp_hash = dataclasses.replace(
        cp_hash, dense_levels=dense_grid.auto_dense_levels(cp_hash))
    short_hash = dataclasses.replace(cp_hash, num_levels=5)
    xla_hash = dataclasses.replace(cp_hash, cp_impl="xla")

    key = jax.random.PRNGKey(0)
    lines = lowrank.init_lines(key, cp_hash)
    lines_s = lowrank.init_lines(key, short_hash)
    enc_params = he.init_encoder(key, cp_hash)
    mu = jnp.zeros(3)
    sigma = jnp.float32(8.0)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (N, 3)) * 7.0

    def scan8(fn):
        """8 reps of fn under one jit; fresh x per rep via fold_in."""
        @jax.jit
        def run(x0):
            def body(c, i):
                x = x0 + (i.astype(jnp.float32) * 1e-4)
                return c + fn(x), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
            return out
        return run

    def grad_of(encode, params):
        def fn(x):
            g = jax.grad(lambda p: jnp.sum(
                encode(p, x) ** 2))(params)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                       for l in jax.tree_util.tree_leaves(g))
        return fn

    cases = {
        "cp_fb": grad_of(lambda p, x: cp_pallas.cp_encode_pallas(
            p, x, mu, sigma, cp_hash), lines),
        "cp_fb_short": grad_of(lambda p, x: cp_pallas.cp_encode_pallas(
            p, x, mu, sigma, short_hash), lines_s),
        "cp_fb_xla": grad_of(lambda p, x: lowrank.cp_encode(
            p, x, mu, sigma, xla_hash), lines),
        "cp_fwd": lambda x: jnp.sum(cp_pallas.cp_encode_pallas(
            lines, x, mu, sigma, cp_hash) ** 2),
        "dense_fb": grad_of(lambda p, x: dense_grid.dense_encode(
            p, x, mu, sigma, cp_hash), enc_params["dense"]),
        "encp_fb": grad_of(lambda p, x: he.encode_params(
            p, x, mu, sigma, cp_hash), enc_params),
    }

    fns = {}
    for name, fn in cases.items():
        print(f"compiling {name} ...", flush=True)
        f = scan8(fn)
        for attempt in range(3):
            try:
                float(f(x0))
                fns[name] = f
                break
            except Exception as e:
                print(f"  {name} attempt {attempt} failed: {e!r}"[:300],
                      flush=True)
                time.sleep(120)
        else:
            results[name] = dict(error="compile failed")

    times = {n: [] for n in fns}
    for rnd in range(3):
        for name, f in fns.items():
            t0 = time.perf_counter()
            float(f(x0))
            times[name].append((time.perf_counter() - t0) / 8)
        print(f"round {rnd}: " + " | ".join(
            f"{n} {times[n][-1]*1e3:.1f} ms" for n in fns), flush=True)

    for name in fns:
        results[name] = dict(ms=round(min(times[name]) * 1e3, 2),
                             all_ms=[round(t * 1e3, 2)
                                     for t in times[name]])
    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("encode_micro_r4.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
