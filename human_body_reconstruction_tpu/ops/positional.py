"""Frequency positional encodings (pure jnp).

Two ladders:
  * ``mode='linear'``: sin(2*x*k), cos(2*x*k) for k = 0..num_freq-1 —
    byte-for-byte the reference's view-direction encoder
    (reference encoder.py:27-33; note k=0 yields constant sin=0 / cos=1
    channels, preserved for parity),
  * ``mode='nerf'``: the standard geometric ladder sin(2**k * x),
    cos(2**k * x).

Output layout matches the reference reshape (encoder.py:33): per input
channel the num_freq sin features then num_freq cos features are
interleaved as (..., d_model * num_freq * 2) with the frequency axis
fastest within sin/cos blocks per channel.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encode(x, num_freq: int, mode: str = "linear"):
    """Encode (..., D) -> (..., D * num_freq * 2)."""
    if mode == "linear":
        k = jnp.arange(num_freq, dtype=x.dtype)
        phase = 2.0 * x[..., None] * k          # (..., D, K)
    elif mode == "nerf":
        k = 2.0 ** jnp.arange(num_freq, dtype=x.dtype)
        phase = x[..., None] * k
    else:
        raise ValueError(f"unknown positional encoding mode: {mode}")
    out = jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)
    return out.reshape(out.shape[:-2] + (x.shape[-1] * num_freq * 2,))
