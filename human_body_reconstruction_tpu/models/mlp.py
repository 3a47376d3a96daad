"""NeRF MLP heads as pure functions over pytree parameters.

Three models, capability-matched to the reference:

  * ``mlp3d``   — the hash-NeRF head (reference test_hash.py:20-105):
    density branch Linear(L*F, 64) -> ReLU -> ... -> Linear(64, 1+15);
    colour branch Linear(15 + d_view, 64) -> ... -> Linear(64, 3);
    density activation LeakyReLU (or 2*sigmoid-1 in SDF mode,
    test_hash.py:59-62); rgb activation sigmoid (default) or ELU
    (reference parity, test_hash.py:67).
  * ``classic_nerf`` — vanilla NeRF 8x256 with skip-concat at layer 4 and
    a view-direction bottleneck branch (reference vol_renderer.py:12-86;
    sigmoid on alpha, ReLU on rgb preserved).
  * ``mlp2d``   — the 2-layer head of the 2-D image-fitting testbed
    (reference test_hash.py:7-18).

No flax: params are nested dicts of jnp arrays, so they drop straight
into optax, shard_map and custom Pallas VJPs.  All matmuls run in the
caller-chosen compute dtype (bf16 on TPU) with fp32 params.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from human_body_reconstruction_tpu.utils.config import ClassicNeRFConfig, MLPConfig


def _init_linear(key, d_in: int, d_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def _linear(p, x, compute_dtype=None):
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32) + b.astype(jnp.float32)


# ---------------------------------------------------------------------------
# MLP_3D (hash-NeRF head)
# ---------------------------------------------------------------------------

def init_mlp3d(key, cfg: MLPConfig, in_dim: int, d_view: int):
    """in_dim = L*F (hash features); d_view = encoded view-dir width."""
    keys = jax.random.split(key, 2 + cfg.num_sig + cfg.num_col)
    it = iter(keys)
    sig = [_init_linear(next(it), in_dim, cfg.width)]
    for i in range(cfg.num_sig):
        d_out = (1 + cfg.geo_feat_dim) if i == cfg.num_sig - 1 else cfg.width
        sig.append(_init_linear(next(it), cfg.width, d_out))
    col = [_init_linear(next(it), cfg.geo_feat_dim + d_view, cfg.width)]
    for i in range(cfg.num_col):
        d_out = 3 if i == cfg.num_col - 1 else cfg.width
        col.append(_init_linear(next(it), cfg.width, d_out))
    return {"sig": sig, "col": col}


def mlp3d_density(params, feats, cfg: MLPConfig, compute_dtype=None):
    """Density branch only -> (raw_density (N,1), geo_feat (N, geo_feat_dim)).

    ``raw_density`` is pre-activation; apply ``density_activation`` via
    :func:`apply_density_activation`.
    """
    h = feats
    n = len(params["sig"])
    for i, p in enumerate(params["sig"]):
        h = _linear(p, h, compute_dtype)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h[..., :1], h[..., 1:]


def apply_density_activation(raw, cfg: MLPConfig):
    if cfg.density_activation == "sdf":
        return 2.0 * jax.nn.sigmoid(raw) - 1.0   # ref test_hash.py:60
    return jax.nn.leaky_relu(raw)                # ref test_hash.py:62


def mlp3d_color(params, geo_feat, viewdirs_enc, cfg: MLPConfig,
                compute_dtype=None):
    h = jnp.concatenate(
        [geo_feat, viewdirs_enc.astype(geo_feat.dtype)], axis=-1)
    n = len(params["col"])
    for i, p in enumerate(params["col"]):
        h = _linear(p, h, compute_dtype)
        if i < n - 1:
            h = jax.nn.relu(h)
    if cfg.rgb_activation == "elu":
        return jax.nn.elu(h)                     # ref test_hash.py:67
    return jax.nn.sigmoid(h)


def apply_mlp3d(params, feats, viewdirs_enc, cfg: MLPConfig,
                compute_dtype=None):
    """Full forward -> (rgb (N,3), density (N,)).

    Equivalent to reference MLP_3D.forward with viewdirs
    (test_hash.py:52-72) but returning (rgb, density) as a tuple instead
    of a concatenated (rgb, sigma) tensor.
    """
    raw, geo = mlp3d_density(params, feats, cfg, compute_dtype)
    density = apply_density_activation(raw, cfg)[..., 0]
    rgb = mlp3d_color(params, geo, viewdirs_enc, cfg, compute_dtype)
    return rgb, density


# ---------------------------------------------------------------------------
# Classic NeRF (vanilla positional-encoding path)
# ---------------------------------------------------------------------------

def init_classic_nerf(key, cfg: ClassicNeRFConfig):
    n_extra = 4 if cfg.d_viewdirs is not None else 1
    keys = jax.random.split(key, cfg.n_layers + n_extra)
    layers = [_init_linear(keys[0], cfg.d_input, cfg.d_filter)]
    for i in range(cfg.n_layers - 1):
        d_in = cfg.d_filter + cfg.d_input if i in cfg.skip else cfg.d_filter
        layers.append(_init_linear(keys[i + 1], d_in, cfg.d_filter))
    params = {"layers": layers}
    k = cfg.n_layers
    if cfg.d_viewdirs is not None:
        params["alpha_out"] = _init_linear(keys[k], cfg.d_filter, 1)
        params["rgb_filters"] = _init_linear(keys[k + 1], cfg.d_filter,
                                             cfg.d_filter)
        params["branch"] = _init_linear(
            keys[k + 2], cfg.d_filter + cfg.d_viewdirs, cfg.d_filter // 2)
        params["output"] = _init_linear(keys[k + 3], cfg.d_filter // 2, 3)
    else:
        params["output"] = _init_linear(keys[k], cfg.d_filter, 4)
    return params


def apply_classic_nerf(params, x, cfg: ClassicNeRFConfig,
                       viewdirs: Optional[jnp.ndarray] = None,
                       compute_dtype=None):
    """-> (rgb (N,3), alpha (N,)).  Skip-concat at cfg.skip
    (reference vol_renderer.py:63-66); sigmoid alpha + ReLU rgb
    (vol_renderer.py:72-82)."""
    x_input = x
    h = x
    for i, p in enumerate(params["layers"]):
        h = jax.nn.relu(_linear(p, h, compute_dtype))
        if i in cfg.skip:
            h = jnp.concatenate([h, x_input], axis=-1)
    if cfg.d_viewdirs is not None:
        alpha = jax.nn.sigmoid(_linear(params["alpha_out"], h, compute_dtype))
        h = _linear(params["rgb_filters"], h, compute_dtype)
        h = jnp.concatenate([h, viewdirs.astype(h.dtype)], axis=-1)
        h = jax.nn.relu(_linear(params["branch"], h, compute_dtype))
        rgb = jax.nn.relu(_linear(params["output"], h, compute_dtype))
        return rgb, alpha[..., 0]
    out = _linear(params["output"], h, compute_dtype)
    return out[..., :3], out[..., 3]


# ---------------------------------------------------------------------------
# MLP_2D (image-fitting testbed) and the SDF sharpness parameter
# ---------------------------------------------------------------------------

def init_mlp2d(key, in_dim: int, width: int = 64):
    k1, k2 = jax.random.split(key)
    return {"l1": _init_linear(k1, in_dim, width),
            "l2": _init_linear(k2, width, 3)}


def apply_mlp2d(params, x, compute_dtype=None):
    """ReLU after both layers (reference test_hash.py:13-18)."""
    h = jax.nn.relu(_linear(params["l1"], x, compute_dtype))
    return jax.nn.relu(_linear(params["l2"], h, compute_dtype))


def init_var_model():
    """Learnable sharpness b=0.5 (reference helper.py:13-21 VarModel)."""
    return {"b": jnp.asarray(0.5, jnp.float32)}
