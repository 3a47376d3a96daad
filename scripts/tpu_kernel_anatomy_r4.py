"""Round-4 kernel anatomy: where do the width-independent ~80 ms of the
CP encode live?

encode_micro_r4.json: full-ladder CP f+b = 102.8 ms but a /8-width
ladder still costs 80.4 — matmul FLOPs, VPU build passes and HBM
traffic all scale with width, so none of them can be the bulk.  This
probes the pallas_call itself with surgical kernel bodies, all at
N = 1.05M, scan8-fused (floor ~4 ms amortised):

  pfwd / pfwd_short      the real forward kernel, full vs /8 width
  pbwd / pbwd_short      the real backward kernel
  dummy                  same grid/specs/DMA, body writes a constant
                         (isolates grid + DMA orchestration)
  nodot                  hat build only, no matmul (isolates the build)
  nobuild                matmul from whatever is in scratch, no build
                         (isolates MXU + out DMA)
  glue                   the XLA product t0*t1*t2 + its dT backward
                         given precomputed T (isolates non-kernel math)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/tpu_kernel_anatomy_r4.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    from human_body_reconstruction_tpu.ops import cp_pallas

    print("devices:", jax.devices(), flush=True)
    N = 32768 * 32
    BM_F, BM_B = 256, 512
    C_PAD = 128
    results = {}

    ladders = {
        "": (66, 130, 258, 514, 1026, 2050),        # flagship 6-level
        "_short": (66, 130, 258),                   # /8 width
    }

    def make_calls(sizes, body_kind):
        offs, _, total = cp_pallas.tight_layout(list(sizes))
        coverage = cp_pallas._block_coverage(list(sizes), offs, total)
        n_lvl = len(sizes)

        def fwd_body(xa, xb, xc, mat_ref, out_ref, w_ref):
            for d, x_ref in enumerate((xa, xb, xc)):
                if body_kind in ("full", "nodot"):
                    cp_pallas._build_w(w_ref, x_ref[:], coverage, BM_F)
                if body_kind in ("full", "nobuild"):
                    out_ref[d] = jnp.dot(
                        w_ref[:], mat_ref[d],
                        preferred_element_type=jnp.float32)
                elif body_kind == "nodot":
                    out_ref[d] = jnp.sum(
                        w_ref[:].astype(jnp.float32), axis=1, keepdims=True
                    ) * jnp.ones((BM_F, C_PAD), jnp.float32)
                elif body_kind == "dummy":
                    out_ref[d] = jnp.full((BM_F, C_PAD), 1.0, jnp.float32)

        x_spec = pl.BlockSpec((BM_F, n_lvl), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((3, total, C_PAD), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((3, BM_F, C_PAD), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        fwd = pl.pallas_call(
            fwd_body, grid=(N // BM_F,),
            in_specs=[x_spec, x_spec, x_spec, mat_spec],
            out_specs=t_spec,
            out_shape=jax.ShapeDtypeStruct((3, N, C_PAD), jnp.float32),
            scratch_shapes=[pltpu.VMEM((BM_F, total), jnp.bfloat16)],
        )

        def bwd_body(xa, xb, xc, dt_ref, dm_ref, w_ref):
            d = pl.program_id(0)
            i = pl.program_id(1)
            for dd, x_ref in enumerate((xa, xb, xc)):
                @pl.when(d == dd)
                def _():
                    cp_pallas._build_w(w_ref, x_ref[:], coverage, BM_B)
            contrib = jax.lax.dot_general(
                w_ref[:], dt_ref[0].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(i == 0)
            def _():
                dm_ref[0] = contrib

            @pl.when(i > 0)
            def _():
                dm_ref[0] = dm_ref[0] + contrib

        xb_spec = pl.BlockSpec((BM_B, n_lvl), lambda d, i: (i, 0),
                               memory_space=pltpu.VMEM)
        dt_spec = pl.BlockSpec((1, BM_B, C_PAD), lambda d, i: (d, i, 0),
                               memory_space=pltpu.VMEM)
        dm_spec = pl.BlockSpec((1, total, C_PAD), lambda d, i: (d, 0, 0),
                               memory_space=pltpu.VMEM)
        bwd = pl.pallas_call(
            bwd_body, grid=(3, N // BM_B),
            in_specs=[xb_spec, xb_spec, xb_spec, dt_spec],
            out_specs=dm_spec,
            out_shape=jax.ShapeDtypeStruct((3, total, C_PAD), jnp.float32),
            scratch_shapes=[pltpu.VMEM((BM_B, total), jnp.bfloat16)],
        )
        return fwd, bwd, total

    def scan8(fn, *args):
        @jax.jit
        def run(*args):
            def body(c, i):
                return c + fn(i, *args), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(8))
            return out
        return run, args

    cases = {}
    for suff, sizes in ladders.items():
        offs, _, total = cp_pallas.tight_layout(list(sizes))
        n_lvl = len(sizes)
        key = jax.random.PRNGKey(0)
        xe = jax.random.uniform(key, (N, n_lvl), maxval=60.0)
        mats = (jax.random.normal(key, (3, total, C_PAD)) * 0.1
                ).astype(jnp.bfloat16)
        dt = jax.random.normal(key, (3, N, C_PAD)) * 0.1

        for kind in (("full", "dummy", "nodot", "nobuild")
                     if suff == "" else ("full",)):
            fwd, bwd, _ = make_calls(sizes, kind)
            cases[f"pfwd_{kind}{suff}"] = scan8(
                lambda i, xe=xe, mats=mats, fwd=fwd: jnp.sum(
                    fwd(xe + i * 1e-5, xe + i * 2e-5, xe + i * 3e-5,
                        mats)[0, ::997, 0]), )
        fwd, bwd, _ = make_calls(sizes, "full")
        cases[f"pbwd{suff}"] = scan8(
            lambda i, xe=xe, dt=dt, bwd=bwd: jnp.sum(
                bwd(xe + i * 1e-5, xe + i * 2e-5, xe + i * 3e-5,
                    dt * (1.0 + i * 1e-3))[:, ::61, 0]), )

    # XLA glue: product + dT given T
    t3 = jax.random.normal(jax.random.PRNGKey(2), (3, N, C_PAD)) * 0.3

    def glue(i, t3=t3):
        t = t3 * (1.0 + i * 1e-4)
        out, vjp = jax.vjp(lambda t: t[0] * t[1] * t[2], t)
        (dt,) = vjp(out)
        return jnp.sum(dt[:, ::997, 0])

    cases["glue"] = scan8(glue)

    fns = {}
    for name, (run, args) in cases.items():
        print(f"compiling {name} ...", flush=True)
        for attempt in range(3):
            try:
                float(run(*args))
                fns[name] = (run, args)
                break
            except Exception as e:
                print(f"  {name} attempt {attempt} failed: {e!r}"[:300],
                      flush=True)
                time.sleep(120)
        else:
            results[name] = dict(error="compile failed")

    times = {n: [] for n in fns}
    for rnd in range(3):
        for name, (run, args) in fns.items():
            t0 = time.perf_counter()
            float(run(*args))
            times[name].append((time.perf_counter() - t0) / 8)
        print(f"round {rnd}: " + " | ".join(
            f"{n} {times[n][-1]*1e3:.1f}" for n in fns), flush=True)

    for name in fns:
        results[name] = dict(ms=round(min(times[name]) * 1e3, 2))
    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("kernel_anatomy_r4.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
