"""Pallas hardware-PRNG kernel.

The TPU interpreter executes the kernel structure but stubs
``prng_random_bits`` to zeros, so interpret-mode tests cover
shape/dtype/plumbing only; distribution and determinism are validated on
real TPU hardware (scripts kept in docs/PERF_NOTES.md runs) and via the
pure-jnp fallback comparison in the encoder integration.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from human_body_reconstruction_tpu.ops import pallas_rng


def test_uniform_bits_shape_and_dtype_interpret():
    b = pallas_rng.uniform_bits(0, (7, 33), interpret=True)
    assert b.shape == (7, 33) and b.dtype == jnp.uint32


def test_uniform_shape_and_range_interpret():
    u = pallas_rng.uniform(3, (130,), interpret=True)
    assert u.shape == (130,) and u.dtype == jnp.float32
    un = np.asarray(u)
    assert un.min() >= 0.0 and un.max() < 1.0


def test_supported_reports_cpu_false():
    assert not pallas_rng.supported()


@pytest.mark.skipif(not pallas_rng.supported(),
                    reason="hardware PRNG needs a TPU backend")
def test_uniform_distribution_tpu():  # pragma: no cover - TPU only
    u = np.asarray(pallas_rng.uniform(7, (1 << 16,)))
    assert abs(u.mean() - 0.5) < 0.01
    a = np.asarray(pallas_rng.uniform_bits(42, (256,)))
    b = np.asarray(pallas_rng.uniform_bits(42, (256,)))
    np.testing.assert_array_equal(a, b)
