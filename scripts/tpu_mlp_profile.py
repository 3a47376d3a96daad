"""MLP sub-profile on the real chip: why is fwd+bwd 37 ms at N=1.05M?

The MLP's FLOPs (~0.13 TFLOP fwd+bwd) are <1 ms at peak and its HBM
traffic (~4 GB incl. the f32 feature input) is ~5 ms — the measured
37 ms is ~7-10x the floor.  This times the pieces to find the waste:
feature dtype (f32 vs bf16 input), density branch alone, colour branch
alone, plain matmul chain of the same shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_mlp_profile.py
"""

import json
import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def timeit(fn, inputs, iters=6):
    fn(inputs[0])
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        sync(fn(inputs[i % len(inputs)]))
    return (time.perf_counter() - t0) / iters


def main():
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.utils import config as C

    print("devices:", jax.devices(), flush=True)
    N = 32768 * 32
    D = 100                       # CP flagship encode width (2*2 + 6*16)
    mcfg = C.MLPConfig()
    pe = C.PosEncConfig()
    mlp = mlp_lib.init_mlp3d(jax.random.PRNGKey(1), mcfg, D, pe.out_dim)
    keys = [jax.random.PRNGKey(i) for i in range(3)]
    feats32 = [jax.random.normal(k, (N, D), jnp.float32) for k in keys]
    feats16 = [f.astype(jnp.bfloat16) for f in feats32]
    dirs = jax.random.normal(jax.random.PRNGKey(9), (N, pe.out_dim))
    results = {}

    def rec(name, dt):
        results[name] = round(dt * 1e3, 2)
        print(f"{name:34s} {dt*1e3:8.1f} ms", flush=True)

    def full_fb(f):
        return jax.grad(lambda m: jnp.sum(mlp_lib.apply_mlp3d(
            m, f, dirs, mcfg, compute_dtype=jnp.bfloat16)[0]))(mlp)

    def full_fwd(f):
        return mlp_lib.apply_mlp3d(mlp, f, dirs, mcfg,
                                   compute_dtype=jnp.bfloat16)[0]

    def dens_fwd(f):
        return mlp_lib.mlp3d_density(mlp, f, mcfg, jnp.bfloat16)[0]

    rec("full fwd (f32 feats)", timeit(jax.jit(full_fwd), feats32))
    rec("full fwd (bf16 feats)", timeit(jax.jit(full_fwd), feats16))
    rec("full f+b (f32 feats)", timeit(jax.jit(full_fb), feats32))
    rec("full f+b (bf16 feats)", timeit(jax.jit(full_fb), feats16))
    rec("density fwd (bf16)", timeit(jax.jit(dens_fwd), feats16))

    # plain matmul chain of the same shapes, bf16, as the roofline ref
    ws = [jax.random.normal(jax.random.PRNGKey(10 + i), s, jnp.bfloat16)
          for i, s in enumerate([(D, 64), (64, 64), (64, 16), (40, 64),
                                 (64, 64), (64, 3)])]

    def chain(f):
        h = f.astype(jnp.bfloat16)
        h = jnp.maximum(h @ ws[0], 0)
        h = jnp.maximum(h @ ws[1], 0)
        g = h @ ws[2]
        h2 = jnp.concatenate([g[:, 1:],
                              jnp.broadcast_to(dirs.astype(jnp.bfloat16)[:, :24],
                                               (f.shape[0], 24)),
                              jnp.zeros((f.shape[0], 1), jnp.bfloat16)],
                             axis=-1)[:, :40]
        h2 = jnp.maximum(h2 @ ws[3], 0)
        h2 = jnp.maximum(h2 @ ws[4], 0)
        return h2 @ ws[5]

    def chain_fb(f):
        return jax.grad(lambda w: jnp.sum(
            jnp.maximum(f.astype(jnp.bfloat16) @ w, 0)))(ws[0])

    rec("bare matmul chain fwd (bf16)", timeit(jax.jit(chain), feats16))
    rec("one-layer f+b (bf16)", timeit(jax.jit(chain_fb), feats16))

    payload = json.dumps(results, indent=1)
    print(payload, flush=True)
    with open("mlp_profile_r3.json", "w") as f:
        f.write(payload)


if __name__ == "__main__":
    main()
