"""Pallas TPU kernel: cheap uniform random bits for stochastic sampling.

The stochastic hash-encoding path draws ~100M Bernoulli bits per step;
threefry costs ~33 ms at that volume (docs/PERF_NOTES.md measurements).
The TPU has a hardware PRNG exposed through Mosaic
(``pltpu.prng_seed`` / ``pltpu.prng_random_bits``) which generates the
same volume nearly for free.  This is the one hot spot in this framework
where a Pallas kernel beats XLA (the gather/scatter core cannot — see
PERF_NOTES for the capability map).

``uniform_bits(seed, shape)`` returns uint32; ``uniform(seed, shape)``
maps them to float32 in [0, 1).  A pure-jnp fallback keeps CPU tests and
non-TPU backends working; the kernel itself is additionally tested in
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 4096  # 2 MB per uint32 output block (VMEM is ~128 MB total)


def _rng_kernel(seed_ref, out_ref):
    # distinct stream per grid block, deterministic per (seed, block)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    out_ref[:] = pltpu.prng_random_bits(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def _uniform_bits_2d(seed, rows: int, interpret: bool = False):
    # Note: the TPU interpreter executes the kernel but stubs
    # prng_random_bits to zeros — fine for plumbing tests.
    padded = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    out = pl.pallas_call(
        _rng_kernel,
        grid=(padded // _BLOCK_ROWS,),
        out_shape=jax.ShapeDtypeStruct((padded, _LANES), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray([seed], jnp.int32))
    return out[:rows]


def uniform_bits(seed, shape, *, interpret: bool = False):
    """uint32 random bits of ``shape`` from the TPU hardware PRNG.

    ``seed`` is an int32 scalar (traced ok). Deterministic per seed.
    """
    n = 1
    for d in shape:
        n *= int(d)
    rows = -(-n // _LANES)
    bits = _uniform_bits_2d(seed, rows, interpret=interpret)
    return bits.reshape(-1)[:n].reshape(shape)


def uniform(seed, shape, *, interpret: bool = False):
    """float32 uniforms in [0, 1) from the hardware PRNG (24-bit mantissa
    construction: bits >> 8 scaled by 2^-24)."""
    bits = uniform_bits(seed, shape, interpret=interpret)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2 ** -24)


def supported() -> bool:
    """True when the current default backend can run the kernel."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False
