"""Round-5 CP kernel anatomy probe (VERDICT r4 next-step 3).

The question: why does the CP encode cost ~80 ms at N=1.05M regardless
of rank (encode_micro_r4.json — a /8-width ladder moved nothing)?

The working hypothesis this probe tests is ANALYTIC, not mysterious:

  * the matmul's output width C = L_fine * R pads to the 128-lane MXU
    floor — every rank <= 21 (C <= 126) executes IDENTICAL kernel
    shapes, so rank cuts below 21 cannot move the dot cost at all;
  * the W hat-build is VPU work ∝ N * sum_G with NO C dependence
    (~1.3e10 elements x ~5 passes per fwd sweep at the flagship
    ladder), so it is width-independent by construction;
  * together they predict the observed flat ladder — and predict that
    the CONTRACTION width sum_G, not the rank, is the real lever
    (n_max 1024 halves sum_G 4096 -> 2048).

Design lessons from the r4 probe post-mortem (docs/STATUS.md): each
variant runs in its OWN subprocess under a wall-clock deadline; results
are written to disk after EVERY timing; standalone-backward pallas
variants (the reproducible helper-killers) are NOT attempted — the
fwd+bwd numbers come from the production custom-VJP path, whose HLO is
what the trainer compiles anyway.

Usage (parent):
  PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/tpu_cp_anatomy_r5.py [--out cp_anatomy_r5.json]
Child (internal): --unit <name> --out <part.json>
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo/scripts")

# 32k rays x 32 guided samples (headline shapes); env override for
# CPU smoke tests of the harness itself
N_POINTS = int(os.environ.get("ANATOMY_N", 1048576))
FLAGSHIP = dict(num_levels=8, n_min=16, n_max=2048)     # sizes sum 4044
HALF = dict(num_levels=7, n_min=16, n_max=1024)         # sizes sum 1994

# (unit, kind, spec) — parent launches them in this order: production
# custom-VJP paths first (trainer-shaped HLOs, safe), bare-kernel
# diagnostics after, all forward-only.
UNITS = [
    # production encode: the decision numbers.  fwd and fwd+bwd, at the
    # flagship ladder (r21/r10: same c_pad -> lane-floor check) and the
    # half ladder (sum_G lever check; r25 pad-free, r50 c_pad 256)
    ("prod_fb_r21_flag", "prod", dict(ladder=FLAGSHIP, rank=21, grad=True)),
    ("prod_fwd_r21_flag", "prod", dict(ladder=FLAGSHIP, rank=21, grad=False)),
    ("prod_fb_r10_flag", "prod", dict(ladder=FLAGSHIP, rank=10, grad=True)),
    ("prod_fb_r25_half", "prod", dict(ladder=HALF, rank=25, grad=True)),
    ("prod_fwd_r25_half", "prod", dict(ladder=HALF, rank=25, grad=False)),
    ("prod_fb_r50_half", "prod", dict(ladder=HALF, rank=50, grad=True)),
    # bare forward kernels: decompose the fwd into build vs dot and
    # sweep the point-tile size (fwd-only kernels compiled fine in r4)
    ("kern_full_bm256", "kern", dict(body="full", bm=256)),
    ("kern_full_bm128", "kern", dict(body="full", bm=128)),
    ("kern_full_bm512", "kern", dict(body="full", bm=512)),
    ("kern_nobuild_bm256", "kern", dict(body="nobuild", bm=256)),
    ("kern_nodot_bm256", "kern", dict(body="nodot", bm=256)),
]


def _sync(x):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(l) for l in leaves))


def _time_calls(fn, make_args, iters=6):
    """Honest timing: varied inputs + forced D2H sync per call."""
    ts = []
    _sync(fn(*make_args(0)))                    # compile
    for i in range(1, iters + 1):
        args = make_args(i)
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {"ms_median": round(1e3 * ts[len(ts) // 2], 2),
            "ms_min": round(1e3 * ts[0], 2),
            "ms_all": [round(1e3 * t, 2) for t in ts]}


def run_prod(spec, record):
    """Production cp_encode_pallas at N_POINTS (fwd or fwd+bwd)."""
    import jax
    import jax.numpy as jnp

    from human_body_reconstruction_tpu.ops import dense_grid, lowrank
    from human_body_reconstruction_tpu.ops.cp_pallas import cp_encode_pallas
    from human_body_reconstruction_tpu.utils import config as C

    hcfg = C.HashConfig(variant="cp", cp_rank=spec["rank"], **spec["ladder"])
    import dataclasses
    hcfg = dataclasses.replace(
        hcfg, dense_levels=dense_grid.auto_dense_levels(hcfg))
    lines = lowrank.init_lines(jax.random.PRNGKey(0), hcfg)
    mu, sigma = jnp.zeros((3,)), jnp.asarray(8.0)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (N_POINTS, 3),
                            minval=-3.5, maxval=3.5)
    record["sizes"] = lowrank.cp_line_sizes(hcfg)
    record["c"] = (hcfg.num_levels - hcfg.dense_levels) * hcfg.cp_rank

    if spec["grad"]:
        def loss(lines, x):
            out = cp_encode_pallas(lines, x, mu, sigma, hcfg)
            return jnp.sum(out * out)
        fn = jax.jit(lambda x: jax.grad(loss)(lines, x))
    else:
        fn = jax.jit(lambda x: cp_encode_pallas(lines, x, mu, sigma, hcfg))
    record.update(_time_calls(fn, lambda i: (x0 + i * 1e-6,)))


def run_kern(spec, record):
    """Bare forward kernel variant at flagship shapes (r21, c_pad 128)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from human_body_reconstruction_tpu.ops import cp_pallas as cpk
    from human_body_reconstruction_tpu.ops import dense_grid, lowrank
    from human_body_reconstruction_tpu.utils import config as C

    import dataclasses
    hcfg = C.HashConfig(variant="cp", cp_rank=21, **FLAGSHIP)
    hcfg = dataclasses.replace(
        hcfg, dense_levels=dense_grid.auto_dense_levels(hcfg))
    sizes = tuple(lowrank.cp_line_sizes(hcfg))
    offs, _p, total = cpk.get_layout(sizes, "tight")
    coverage = cpk._block_coverage(sizes, offs, total)
    n_lvl, c_pad, bm = len(sizes), 128, spec["bm"]
    body = spec["body"]
    record.update(sizes=list(sizes), total=total, c_pad=c_pad, bm=bm)

    def kernel(xa, xb, xc, mat, out, w1, w2):
        for d, x_ref in enumerate((xa, xb, xc)):
            w_ref = (w1, w2)[d % 2]
            if body == "nobuild":
                # one broadcast store — the cheapest possible fill
                w_ref[...] = jnp.full((bm, total), 0.5, jnp.bfloat16)
            else:
                cpk._build_w(w_ref, x_ref[:], coverage, bm)
            if body == "nodot":
                # skip the MXU: copy one 128-block through the out ref
                out[d] = w_ref[:, :c_pad].astype(jnp.float32)
            else:
                out[d] = jnp.dot(w_ref[:], mat[d],
                                 preferred_element_type=jnp.float32)

    x_spec = pl.BlockSpec((bm, n_lvl), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((3, total, c_pad), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((3, bm, c_pad), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, grid=(N_POINTS // bm,),
        in_specs=[x_spec, x_spec, x_spec, mat_spec],
        out_specs=t_spec,
        out_shape=jax.ShapeDtypeStruct((3, N_POINTS, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, total), jnp.bfloat16)
                        for _ in range(2)],
        interpret=jax.default_backend() != "tpu",
    )
    scales = np.asarray([float(s) for s in sizes], np.float32)
    key = jax.random.PRNGKey(2)
    xe0 = jax.random.uniform(key, (N_POINTS, 3, n_lvl)) * (scales - 2.0)
    mats = jax.random.normal(jax.random.PRNGKey(3),
                             (3, total, c_pad), jnp.bfloat16) * 0.1
    fn = jax.jit(lambda xe: call(xe[:, 0], xe[:, 1], xe[:, 2], mats))
    record.update(_time_calls(fn, lambda i: (xe0 + i * 1e-4,)))


def child(unit, out):
    kinds = {name: (kind, spec) for name, kind, spec in UNITS}
    kind, spec = kinds[unit]
    record = {"unit": unit, "kind": kind, "n_points": N_POINTS}
    t0 = time.time()
    try:
        (run_prod if kind == "prod" else run_kern)(spec, record)
    except Exception as e:
        record["error"] = repr(e)[:400]
    record["wall_s"] = round(time.time() - t0, 1)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="cp_anatomy_r5.json")
    ap.add_argument("--unit", default="")
    ap.add_argument("--units", default="",
                    help="comma list to run (default: all, listed order)")
    ap.add_argument("--unit_timeout", type=float, default=1500.0)
    ap.add_argument("--crash_backoff", type=float, default=150.0)
    args = ap.parse_args()

    if args.unit:                       # child
        child(args.unit, args.out)
        return

    names = args.units.split(",") if args.units else [u[0] for u in UNITS]
    results = {}
    for name in names:
        part = f"{args.out}.{name}.part.json"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--unit", name, "--out", part]
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = ":".join(
            p for p in (repo, env.get("PYTHONPATH", "")) if p)
        print(f"[anatomy] {name} (deadline {args.unit_timeout:.0f}s)",
              flush=True)
        failed = None
        try:
            p = subprocess.run(cmd, timeout=args.unit_timeout, env=env)
            if p.returncode != 0:
                failed = f"exit {p.returncode}"
        except subprocess.TimeoutExpired:
            failed = "deadline exceeded"
        if os.path.exists(part):
            with open(part) as f:
                results[name] = json.load(f)
        else:
            results[name] = {"unit": name, "error": failed or "no output"}
        if failed or "error" in results[name]:
            print(f"[anatomy] {name} FAILED; backoff", flush=True)
            time.sleep(args.crash_backoff)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("[anatomy] done ->", args.out, flush=True)


if __name__ == "__main__":
    main()
