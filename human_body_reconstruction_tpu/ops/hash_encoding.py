"""Multiresolution hash-grid encoding (Instant-NGP style), pure jnp.

Rebuilds the capability of reference ``hash_encoding.py`` TPU-first:

  * ONE stacked table of shape (L, T, F) instead of L separate
    nn.Embedding modules, so the per-level Python loop
    (reference hash_encoding.py:152-165, 16 sequential gather launches)
    becomes a single batched gather that XLA tiles well,
  * the spatial hash uses explicit uint32 wraparound arithmetic
    ``(x0*p0) ^ (x1*p1) ^ (x2*p2) mod T`` with the Instant-NGP primes
    [1, 2654435761, 805459861] (reference hash_encoding.py:24, 41-55 gets
    the same family of hash via int64 + int32-overflowed constants),
  * T is a power of two so `mod T` is a bitwise AND,
  * corner enumeration / n-linear weights use the same bin-mask formulation
    as the reference (hash_encoding.py:34-39, 135, 142-144): corner c uses
    floor coords where bit d of c is 0 and weights prod(where(bit==0,
    1-frac, frac)),
  * interpolation fractions are stop_gradient'ed, matching the reference's
    ``diff.detach()`` (hash_encoding.py:160).

Levels: N_l = n_min * b**l, b = exp((ln n_max - ln n_min)/(L-1))
(reference hash_encoding.py:13, 153).  Inputs are normalised as
(x - mu) / sigma before scaling by N_l (reference hash_encoding.py:154).

A fused Pallas gather kernel for the *hashed* levels is parked on
measured Mosaic limitations (no usable sublane gather/scatter at this
toolchain — docs/PERF_NOTES.md); the coarse levels can instead bypass
hashing entirely via the dense-grid path in ``ops/dense_grid.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from human_body_reconstruction_tpu.utils.config import HashConfig

# Instant-NGP spatial-hash primes (reference hash_encoding.py:24).
PRIMES = (1, 2654435761, 805459861)


def level_scales(cfg: HashConfig) -> np.ndarray:
    """Per-level resolutions N_l (float64 on host, static)."""
    if cfg.num_levels == 1:
        return np.asarray([float(cfg.n_min)])
    b = np.exp((np.log(cfg.n_max) - np.log(cfg.n_min)) / (cfg.num_levels - 1))
    return cfg.n_min * b ** np.arange(cfg.num_levels)


def init_table(key, cfg: HashConfig, dtype=jnp.float32):
    """(L_hashed, T, payload) table, U(-init_scale, init_scale)
    (ref hash_encoding.py:32).  payload is F for the reference-exact
    "corner" variant and F * 2**dim for the "cell" variant (all corner
    features of a cell co-stored in its bucket).  With
    ``cfg.dense_levels`` > 0 the table holds only the hashed levels —
    the coarse levels live in dense grids (ops/dense_grid.py)."""
    return jax.random.uniform(
        key, (cfg.num_hashed_levels, cfg.table_size, cfg.payload),
        dtype=dtype, minval=-cfg.init_scale, maxval=cfg.init_scale)


def init_encoder(key, cfg: HashConfig, dtype=jnp.float32):
    """Full encoder param dict: {"table": (L_hashed, T, P)} plus
    {"dense": tuple of (G, G, G, F)} when ``cfg.dense_levels`` > 0.
    variant="cp" stores {"lines": tuple of (dim, G_l, R)} factor lines
    (ops/lowrank.py) instead of a hash table."""
    from human_body_reconstruction_tpu.ops import dense_grid

    k1, k2 = jax.random.split(key)
    if cfg.variant == "cp":
        from human_body_reconstruction_tpu.ops import lowrank

        params = {"lines": lowrank.init_lines(k1, cfg, dtype)}
    else:
        params = {"table": init_table(k1, cfg, dtype)}
    if cfg.dense_levels > 0:
        params["dense"] = dense_grid.init_dense(k2, cfg, dtype)
    return params


def _features_to_out(feats):
    """F feature planes of shape (L, N) -> (N, L*F) output.

    Deliberately routed as (F,L,N) -> (L,F,N) -> (L*F, N) -> transpose:
    every intermediate keeps the big N axis minor (lane-friendly); the
    naive (N, L, F) layout has a minor dim of F that the TPU lane-pads
    64x (measured: it is what made the encoder backward 3x slower than
    its scatter, scripts/tpu_profile_step.py)."""
    stacked = jnp.stack(feats)                    # (F, L, N)
    F, L, N = stacked.shape
    return stacked.transpose(1, 0, 2).reshape(L * F, N).T


def _cotangent_to_lfn(g, L: int, F: int):
    """(N, L*F) cotangent -> (L, F, N), avoiding any minor-F layout."""
    return g.T.reshape(L, F, -1)


def scatter_add_flat(size: int, idx, val, strategy: str = "random"):
    """Sum ``val`` into ``zeros((size,))`` at positions ``idx``.

    ``idx``/``val`` are flattened.  All strategies compute the same sums
    (reassociated), so gradients are exact either way:

      * ``random``: one ``.at[].add`` — every contribution pays the
        ~4KB random-write tile (~77M contribs/s on v5e,
        scripts/tpu_probe_r2.py),
      * ``sorted``: ``lax.sort`` the (index, value) pairs, then scatter
        with ``indices_are_sorted=True`` — trades the tile tax for a
        bitonic sort,
      * ``segsum``: sort, collapse duplicate-index runs with a sorted
        segment sum, then ONE sorted scatter of unique indices (unused
        run slots park at ``size - 1`` with value 0, keeping the final
        index list sorted).

    Pick by measurement: scripts/tpu_probe_scatter.py.
    """
    idx = idx.reshape(-1)
    val = val.reshape(-1).astype(jnp.float32)
    if strategy == "random":
        return jnp.zeros((size,), jnp.float32).at[idx].add(val)
    si, sv = jax.lax.sort((idx, val), num_keys=1)
    if strategy == "sorted":
        return jnp.zeros((size,), jnp.float32).at[si].add(
            sv, indices_are_sorted=True)
    if strategy != "segsum":
        raise ValueError(f"unknown scatter strategy {strategy!r}")
    n = si.shape[0]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), si[1:] != si[:-1]])
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1      # sorted
    totals = jnp.zeros((n,), jnp.float32).at[run_id].add(
        sv, indices_are_sorted=True)
    out_idx = jnp.full((n,), size - 1, jnp.int32).at[run_id].min(
        si, indices_are_sorted=True)
    return jnp.zeros((size,), jnp.float32).at[out_idx].add(
        totals, indices_are_sorted=True)


def _corner_offsets(dim: int) -> np.ndarray:
    """(2**dim, dim) binary corner offsets; offset bit d of corner c is
    bit d of c (so corner 0 is the floor corner — the complement of the
    reference's bin_mask convention, same enumeration)."""
    corners = np.arange(2 ** dim)
    dims = np.arange(dim)
    return ((corners[:, None] >> dims[None, :]) & 1).astype(np.int32)


def hash_corner_indices(coords_u32, table_size: int):
    """Spatial hash of integer grid coords into [0, T).

    Args:
      coords_u32: (..., dim) uint32 grid coordinates.
      table_size: power-of-two table size T.
    Returns:
      (...,) uint32 indices.
    """
    dim = coords_u32.shape[-1]
    acc = coords_u32[..., 0] * jnp.uint32(PRIMES[0])
    for d in range(1, dim):
        acc = acc ^ (coords_u32[..., d] * jnp.uint32(PRIMES[d]))
    return acc & jnp.uint32(table_size - 1)


def _level_coords(x, mu, sigma, cfg: HashConfig, scales=None):
    """Shared front-end: (dim, L_hashed, N) integer cells + fractions.

    The first ``cfg.dense_levels`` levels are excluded — they are
    evaluated by the dense-grid path (ops/dense_grid.py).  ``scales``
    overrides the static ladder with a DYNAMIC per-level resolution
    array — the level-parallel path passes each chip its local slice
    (parallel/level_parallel.py)."""
    if scales is None:
        scales = jnp.asarray(level_scales(cfg)[cfg.dense_levels:],
                             dtype=jnp.float32)                  # (L_hashed,)
    xn = ((x.astype(jnp.float32) - mu) / sigma).T                # (dim, N)
    xl = xn[:, None, :] * scales[None, :, None]                  # (dim, L, N)
    x0f = jnp.floor(xl)
    frac = jax.lax.stop_gradient(xl - x0f)                       # (dim, L, N)
    return x0f.astype(jnp.int32), frac


def _hash_levels(coord_u32, cfg: HashConfig):
    """(dim, L, N) uint32 coords -> (L, N) bucket index in [0, T)."""
    idx = coord_u32[0] * jnp.uint32(PRIMES[0])
    for d in range(1, cfg.dim):
        idx = idx ^ (coord_u32[d] * jnp.uint32(PRIMES[d]))
    return idx & jnp.uint32(cfg.table_size - 1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def hash_encode_cell(table, x, mu, sigma, cfg: HashConfig, scales=None):
    """TPU-fast "cell" variant: one hash + one row-gather per
    (point, level); the bucket holds all 2**dim corner features.

    8x fewer gathers than the corner variant — the dominant cost on TPU,
    where XLA's gather emitter pays a full memory tile per random index
    (docs/PERF_NOTES.md).  Trade-off: corners are NOT shared between
    adjacent cells, so the field can be discontinuous across cell faces;
    within a cell it is the exact trilinear interpolant.
    """
    L, T, P = table.shape
    dim, F, C = cfg.dim, cfg.features_per_level, cfg.corners
    N = x.shape[0]
    x0, frac = _level_coords(x, mu, sigma, cfg, scales)
    idx = _hash_levels(x0.astype(jnp.uint32), cfg)               # (L, N)
    level_offsets = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))
    rows_idx = (idx + level_offsets[:, None]).astype(jnp.int32)  # (L, N)

    # ONE row-gather per (point, level): slice_sizes (1, P).  Both the
    # gather and its autodiff scatter are then priced once per
    # (point, level) rather than once per scalar feature.
    rows = jnp.take(table.reshape(L * T, P), rows_idx, axis=0)   # (L, N, P)

    offsets = _corner_offsets(dim)
    acc = [jnp.zeros((L, N), dtype=table.dtype) for _ in range(F)]
    for c in range(C):
        off = offsets[c]
        w = jnp.ones((L, N), dtype=jnp.float32)
        for d in range(dim):
            w = w * (frac[d] if off[d] else (1.0 - frac[d]))
        w = w.astype(table.dtype)
        for f in range(F):
            acc[f] = acc[f] + rows[..., c * F + f] * w
    return _features_to_out(acc)


@functools.partial(jax.jit, static_argnames=("cfg",))
def hash_encode_stochastic(table, x, mu, sigma, cfg: HashConfig, key,
                           scales=None):
    """Unbiased single-corner estimate of the corner-variant encoding.

    Per (point, level) each corner bit d is drawn Bernoulli(frac_d),
    which selects corner c with exactly the trilinear weight w_c, so
    E[table[hash(corner)]] equals the full interpolant.  2**dim fewer
    gathers; gradient flows to the sampled corner only (an unbiased
    SGD-style estimator for training; use the exact path for eval).
    """
    L, T, F = table.shape
    dim = cfg.dim
    N = x.shape[0]
    key = _fold_level_axis(key, cfg)
    x0, frac = _level_coords(x, mu, sigma, cfg, scales)
    u = _stoch_uniform(key, (dim, L, N), cfg)
    bits = (u < frac).astype(jnp.int32)                          # (dim, L, N)
    coord = (x0 + bits).astype(jnp.uint32)
    idx = _hash_levels(coord, cfg)
    level_offsets = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))
    base = ((idx + level_offsets[:, None]) * jnp.uint32(F)).astype(jnp.int32)
    flat = table.reshape(L * T * F)
    acc = [jnp.take(flat, base + f) for f in range(F)]           # F x (L, N)
    return _features_to_out(acc)


@functools.partial(jax.jit, static_argnames=("cfg",))
def hash_encode(table, x, mu, sigma, cfg: HashConfig, scales=None):
    """Encode points with the multiresolution hash grid.

    TPU layout note: every large intermediate keeps the point axis N in
    the minor-most (lane) dimension — arrays shaped (dim, L, N), (L, N)
    and (F, L, N) tile perfectly onto the (8, 128) VPU registers, whereas
    the naive (N, L, C, F) gather output has a minor dim of F=2 that the
    TPU would lane-pad 64x (observed as a 34 GB allocation for a 0.5 GB
    gather).  The 2**dim corner contributions are accumulated in an
    unrolled loop so no (..., C, F) tensor is ever materialised.

    Args:
      table: (L, T, F) feature table.
      x: (N, dim) points.
      mu: broadcastable offset (scene min-bound in the trainer,
        reference train_hash2.py:117).
      sigma: broadcastable scale (scene diagonal, train_hash2.py:119).
      cfg: static HashConfig.
      scales: optional dynamic (L,) per-level resolutions overriding the
        static ladder (level-parallel local slice).
    Returns:
      (N, L*F) encoded features, dtype of ``table``.
    """
    L, T, F = table.shape
    dim = cfg.dim
    N = x.shape[0]
    x0, frac = _level_coords(x, mu, sigma, cfg, scales)
    offsets = _corner_offsets(dim)                               # host (C, dim)
    # Flat 1-D table: XLA:TPU keeps the (8 MB default) operand VMEM-
    # resident and runs 1-D gathers at near-bandwidth speed, whereas
    # multi-dim take formulations (e.g. axis-1 take on a (F, L*T)
    # operand) lower to a pathologically slow gather (measured 1.3M
    # points/s vs the ~600 GB/s flat path).
    table_flat = table.reshape(L * T * F)
    level_offsets = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))

    acc = [jnp.zeros((L, N), dtype=table.dtype) for _ in range(F)]
    for c in range(2 ** dim):
        off = offsets[c]                                         # (dim,) 0/1
        coord = (x0 + jnp.asarray(off[:, None, None])).astype(jnp.uint32)
        idx = _hash_levels(coord, cfg)                           # (L, N)
        base = ((idx + level_offsets[:, None]) * jnp.uint32(F)).astype(jnp.int32)
        w = jnp.ones((L, N), dtype=jnp.float32)
        for d in range(dim):
            w = w * (frac[d] if off[d] else (1.0 - frac[d]))
        w = w.astype(table.dtype)
        for f in range(F):
            feats = jnp.take(table_flat, base + f)               # (L, N)
            acc[f] = acc[f] + feats * w
    # (F, L, N) -> (N, L, F) -> (N, L*F)
    return _features_to_out(acc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hash_encode_packed_exact(table, x, mu, sigma, cfg: HashConfig,
                             scales=None):
    """EXACT 8-corner trilerp with PACKED word reads: one uint32 per
    (corner, level) fetches all F features — F x fewer tile-priced
    lookups than :func:`hash_encode` (the fp32 exact path does F
    separate takes per corner).  Eval-only (no VJP): features are
    bf16-rounded (F=2) or int8-quantised (F<=4), i.e. exactly the
    values the packed/int8 stochastic TRAINING forward reads, so
    evaluating a packed-trained model this way is arguably more
    faithful than reading the fp32 master table.  Measured need: the
    256^3 mesh sweep of an int8-trained field spent ~17 min in the
    32-takes-per-corner exact path (docs/PERF_NOTES.md round 2).
    """
    L, T, F = table.shape
    dim = cfg.dim
    N = x.shape[0]
    if cfg.pack_format == "int8":
        words_tbl, scale = pack_table_int8(table)
        unpack = lambda w, f: _unpack_int8(w, f, scale[:, None])
    else:
        words_tbl = pack_table_bf16(table)
        unpack = _unpack_bf16
    x0, frac = _level_coords(x, mu, sigma, cfg, scales)
    offsets = _corner_offsets(dim)                               # (C, dim)
    level_offsets = jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T)

    acc = [jnp.zeros((L, N), jnp.float32) for _ in range(F)]
    for c in range(2 ** dim):
        off = offsets[c]
        coord = (x0 + jnp.asarray(off[:, None, None])).astype(jnp.uint32)
        idx = _hash_levels(coord, cfg)                           # (L, N)
        rows = (idx + level_offsets[:, None]).astype(jnp.int32)
        words = jnp.take(words_tbl, rows)                        # (L, N)
        w = jnp.ones((L, N), jnp.float32)
        for d in range(dim):
            w = w * (frac[d] if off[d] else (1.0 - frac[d]))
        for f in range(F):
            acc[f] = acc[f] + unpack(words, f) * w
    return _features_to_out(acc).astype(table.dtype)


def _packed_exact_fwd(table, x, mu, sigma, cfg, scales=None):
    return (hash_encode_packed_exact(table, x, mu, sigma, cfg, scales),
            (table.shape, x, mu, sigma, scales))


def _packed_exact_bwd(cfg, res, g):
    """Exact trilerp table-gradient (straight-through past the
    quantisation, as in the stochastic training paths): per corner,
    scatter w * g into the corner's F slots.  Only runs when someone
    differentiates the exact path (e.g. SDF eikonal finite differences
    with a packed config) — eval renders never reach it."""
    tshape, x, mu, sigma, scales = res
    L, T, F = tshape
    glfn = _cotangent_to_lfn(g, L, F).astype(jnp.float32)        # (L, F, N)
    x0, frac = _level_coords(x, mu, sigma, cfg, scales)
    offsets = _corner_offsets(cfg.dim)
    level_offsets = jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T)
    dflat = jnp.zeros((L * T * F,), jnp.float32)
    for c in range(2 ** cfg.dim):
        off = offsets[c]
        coord = (x0 + jnp.asarray(off[:, None, None])).astype(jnp.uint32)
        idx = _hash_levels(coord, cfg)
        base = ((idx + level_offsets[:, None])
                * jnp.uint32(F)).astype(jnp.int32)
        w = jnp.ones(idx.shape, jnp.float32)
        for d in range(cfg.dim):
            w = w * (frac[d] if off[d] else (1.0 - frac[d]))
        for f in range(F):
            dflat = dflat.at[base + f].add(w * glfn[:, f, :])
    return dflat.reshape(L, T, F), None, None, None, None


hash_encode_packed_exact.defvjp(_packed_exact_fwd, _packed_exact_bwd)


def pack_table_bf16(table):
    """(L, T, 2) fp32 table -> (L*T,) uint32 of packed bf16 pairs.

    Feature f sits in bits [16f, 16f+16).  Used by the packed stochastic
    gather: one uint32 lookup fetches both features, halving the
    dominant per-lookup tile cost (docs/PERF_NOTES.md).
    """
    L, T, F = table.shape
    assert F == 2, "packing supports exactly 2 features per level"
    b16 = jax.lax.bitcast_convert_type(
        table.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = b16[..., 0] | (b16[..., 1] << 16)
    return packed.reshape(L * T)


def _unpack_bf16(word, half: int):
    """uint32 packed pair -> fp32 of the bf16 in the given half."""
    bits16 = (word >> (16 * half)) & jnp.uint32(0xFFFF)
    return jax.lax.bitcast_convert_type((bits16 << 16).astype(jnp.uint32),
                                        jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hash_encode_stochastic_packed(table, x, mu, sigma, cfg: HashConfig,
                                  key, scales=None):
    """Packed-pair stochastic encoding: ONE uint32 gather per
    (point, level) — bf16 feature pairs packed into one word — with a
    custom VJP that scatters fp32 gradients straight into the table.

    Numerically: forward features are bf16-rounded (the TPU analog of
    Instant-NGP's fp16 tables); gradients and optimizer state stay fp32.
    """
    out, _ = _stoch_packed_fwd_impl(table, x, mu, sigma, cfg, key, scales)
    return out


def _stoch_uniform(key, shape, cfg: HashConfig):
    """Bernoulli-driver uniforms: threefry by default, or the Pallas
    hardware-PRNG kernel (ops/pallas_rng.py) when cfg.hw_rng is set and
    a TPU backend is active (~10x cheaper at training volumes)."""
    if cfg.hw_rng and jax.default_backend() not in ("cpu", "gpu"):
        from human_body_reconstruction_tpu.ops import pallas_rng

        seed = jax.random.randint(key, (), 0, 2 ** 31 - 1, dtype=jnp.int32)
        return pallas_rng.uniform(seed, shape)
    return jax.random.uniform(key, shape)


def _fold_level_axis(key, cfg: HashConfig):
    """Level-parallel RNG: each level-chip draws its own stream (the
    single-device stream covers all L levels in one draw; under level
    sharding the chips would otherwise REPEAT one block's bit pattern
    across every level block).  Distribution-equivalent, not bitwise-
    equal, to the single-device stream."""
    if cfg.level_axis is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(cfg.level_axis))
    return key


def _stoch_packed_indices(x, mu, sigma, cfg: HashConfig, key, scales=None):
    x0, frac = _level_coords(x, mu, sigma, cfg, scales)
    u = _stoch_uniform(_fold_level_axis(key, cfg), frac.shape, cfg)
    bits = (u < frac).astype(jnp.int32)
    coord = (x0 + bits).astype(jnp.uint32)
    idx = _hash_levels(coord, cfg)                               # (L, N)
    L = idx.shape[0]
    level_offsets = (jnp.arange(L, dtype=jnp.uint32)
                     * jnp.uint32(cfg.table_size))
    return (idx + level_offsets[:, None]).astype(jnp.int32)      # (L, N)


def _stoch_packed_fwd_impl(table, x, mu, sigma, cfg, key, scales=None):
    L, T, F = table.shape
    N = x.shape[0]
    rows = _stoch_packed_indices(x, mu, sigma, cfg, key, scales)
    packed = pack_table_bf16(table)
    words = jnp.take(packed, rows)                               # (L, N)
    feats = [_unpack_bf16(words, f) for f in range(F)]           # F x (L, N)
    out = _features_to_out(feats)
    return out, rows


def _stoch_packed_fwd(table, x, mu, sigma, cfg, key, scales=None):
    out, rows = _stoch_packed_fwd_impl(table, x, mu, sigma, cfg, key, scales)
    pick = None
    if cfg.grad_subsample:
        # fresh per-step feature choice (a step-invariant choice would
        # starve the unchosen feature of gradient)
        pick = jax.random.bernoulli(
            jax.random.fold_in(_fold_level_axis(key, cfg), 1), 0.5,
            rows.shape)
    return out, (rows, pick, table.shape)


def _stoch_packed_bwd(cfg, res, g):
    rows, pick, tshape = res
    L, T, F = tshape
    glfn = _cotangent_to_lfn(g, L, F)                            # (L, F, N)
    if cfg.grad_subsample and F == 2:
        # Unbiased scatter subsampling: per (point, level) route 2x the
        # gradient of ONE randomly chosen feature — halves scatter
        # contributions, the dominant backward cost (PERF_NOTES.md).
        pick_f = pick.astype(jnp.float32)
        g_sel = 2.0 * (glfn[:, 0, :] * (1.0 - pick_f)
                       + glfn[:, 1, :] * pick_f)
        flat_idx = rows * F + pick.astype(jnp.int32)
        dflat = scatter_add_flat(L * T * F, flat_idx, g_sel,
                                 cfg.scatter_strategy)
        return dflat.reshape(L, T, F), None, None, None, None, None
    if cfg.scatter_strategy == "random":
        flat = [scatter_add_flat(L * T, rows, glfn[:, f, :], "random")
                for f in range(F)]
        dtable = jnp.stack(flat, axis=-1).reshape(L, T, F)
    else:
        # one fused sort over ALL F features' contributions (the same
        # reshaping the int8 branch uses) instead of F full sorts
        base = rows * F
        idx = jnp.stack([(base + f).reshape(-1) for f in range(F)])
        val = jnp.stack([glfn[:, f, :].reshape(-1) for f in range(F)])
        dtable = scatter_add_flat(L * T * F, idx, val,
                                  cfg.scatter_strategy).reshape(L, T, F)
    return dtable, None, None, None, None, None


hash_encode_stochastic_packed.defvjp(_stoch_packed_fwd, _stoch_packed_bwd)


def pack_table_int8(table):
    """(L, T, F<=4) fp32 table -> ((L*T,) uint32 words, (L,) scales).

    Symmetric per-level int8 quantisation with a dynamic scale
    s_l = max|table_l|: feature f of a bucket sits in byte f of its word.
    One uint32 lookup then fetches up to FOUR features — half the
    per-lookup tile cost of bf16 pairs at F=4 (docs/PERF_NOTES.md: the
    lookup count is the entire cost on this chip).
    """
    L, T, F = table.shape
    assert F <= 4, "int8 packing fits at most 4 features per word"
    scale = jnp.max(jnp.abs(table), axis=(1, 2)) + 1e-12            # (L,)
    q = jnp.round(table / scale[:, None, None] * 127.0)
    q = jnp.clip(q, -127.0, 127.0).astype(jnp.int32)
    word = jnp.zeros((L, T), jnp.uint32)
    for f in range(F):
        word = word | ((q[..., f].astype(jnp.uint32) & jnp.uint32(0xFF))
                       << jnp.uint32(8 * f))
    return word.reshape(L * T), scale


def _unpack_int8(word, f: int, scale):
    """Byte f of each uint32 word -> fp32 feature (sign-extended),
    scale (L, 1) broadcast over (L, N)."""
    b = ((word >> jnp.uint32(8 * f)) & jnp.uint32(0xFF)).astype(jnp.int32)
    b = b - 256 * (b > 127)
    return b.astype(jnp.float32) * (scale / 127.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hash_encode_stochastic_int8(table, x, mu, sigma, cfg: HashConfig,
                                key, scales=None):
    """Stochastic-corner encoding over a dynamically int8-quantised
    table: ONE uint32 gather per (point, level) carries F (up to 4)
    features.  Straight-through estimator: forward features are
    int8-rounded, gradients scatter fp32 into the master table (the
    standard QAT treatment; the optimizer state stays exact).
    """
    out, _ = _stoch_int8_fwd_impl(table, x, mu, sigma, cfg, key, scales)
    return out


def _stoch_int8_fwd_impl(table, x, mu, sigma, cfg, key, scales=None):
    L, T, F = table.shape
    N = x.shape[0]
    rows = _stoch_packed_indices(x, mu, sigma, cfg, key, scales)    # (L, N)
    words_tbl, scale = pack_table_int8(table)
    words = jnp.take(words_tbl, rows)                               # (L, N)
    feats = [_unpack_int8(words, f, scale[:, None]) for f in range(F)]
    out = _features_to_out(feats)
    return out.astype(table.dtype), rows


def _stoch_int8_fwd(table, x, mu, sigma, cfg, key, scales=None):
    out, rows = _stoch_int8_fwd_impl(table, x, mu, sigma, cfg, key, scales)
    kf = _fold_level_axis(key, cfg)
    pick = lsel = psel = None
    if cfg.grad_subsample:
        F = table.shape[-1]
        pick = jax.random.randint(jax.random.fold_in(kf, 1), rows.shape,
                                  0, F)
    if cfg.grad_level_subsample:
        L = table.shape[0]
        lsel = jax.random.randint(jax.random.fold_in(kf, 2),
                                  (rows.shape[-1],), 0, L)
    if cfg.grad_level_pair:
        # one level of every consecutive (hashed-)level pair, per point
        L = table.shape[0]
        psel = jax.random.randint(jax.random.fold_in(kf, 3),
                                  (L // 2, rows.shape[-1]), 0, 2)
    return out, (rows, pick, lsel, psel, table.shape)


def _stoch_int8_bwd(cfg, res, g):
    rows, pick, lsel, psel, tshape = res
    L, T, F = tshape
    glfn = _cotangent_to_lfn(g, L, F).astype(jnp.float32)        # (L, F, N)
    if cfg.grad_subsample:
        # unbiased 1-of-F feature subsampling: route F x the gradient of
        # one randomly chosen feature -> scatter volume drops F-fold
        g_sel = jnp.zeros(rows.shape, jnp.float32)
        for f in range(F):
            g_sel = g_sel + glfn[:, f, :] * (pick == f)
        g_sel = g_sel * float(F)                                 # (L, N)
        if psel is not None:
            # unbiased 1-of-2 LEVEL-PAIR subsampling: per point route
            # 2x the gradient of one randomly chosen level of every
            # consecutive level pair — the scatter volume (the dominant
            # backward cost, docs/PERF_NOTES.md) halves while every
            # point still trains one level per resolution pair (far
            # gentler than grad_level_subsample's 1-of-L routing).
            # Selection by masked reduction over the 2-axis (no gathers).
            N = rows.shape[-1]
            onehot = (psel[:, None, :]
                      == jnp.arange(2, dtype=psel.dtype)[None, :, None])
            g_half = jnp.sum(g_sel.reshape(L // 2, 2, N)
                             * onehot, axis=1) * 2.0             # (L/2, N)
            rows_half = jnp.sum(rows.reshape(L // 2, 2, N)
                                * onehot.astype(rows.dtype), axis=1)
            pick_half = jnp.sum(pick.reshape(L // 2, 2, N)
                                * onehot.astype(pick.dtype), axis=1)
            flat_idx = rows_half * F + pick_half.astype(jnp.int32)
            dflat = scatter_add_flat(L * T * F, flat_idx, g_half,
                                     cfg.scatter_strategy)
            return dflat.reshape(L, T, F), None, None, None, None, None
        if lsel is not None:
            # unbiased 1-of-L LEVEL subsampling on top: route L x the
            # gradient of one randomly chosen level per point — the
            # scatter shrinks to ONE contribution per point (scatter
            # contributions are tile-priced like gathers, PERF_NOTES).
            # Selection by masked reduction (no gathers).
            onehot = (jnp.arange(L)[:, None] == lsel[None, :])   # (L, N)
            g_pt = jnp.sum(g_sel * onehot, axis=0) * float(L)    # (N,)
            rows_pt = jnp.sum(rows * onehot, axis=0)             # (N,)
            pick_pt = jnp.sum(pick * onehot.astype(pick.dtype), axis=0)
            flat_idx = rows_pt * F + pick_pt.astype(jnp.int32)
            dflat = scatter_add_flat(L * T * F, flat_idx, g_pt,
                                     cfg.scatter_strategy)
            return dflat.reshape(L, T, F), None, None, None, None, None
        flat_idx = rows * F + pick.astype(jnp.int32)
        dflat = scatter_add_flat(L * T * F, flat_idx, g_sel,
                                 cfg.scatter_strategy)
        return dflat.reshape(L, T, F), None, None, None, None, None
    # scalar scatters per feature: measured FASTER than one (1, F)
    # row-window scatter on v5e (77M vs ~45M scalar-contributions/s,
    # scripts/tpu_probe_r2.py)
    base = rows * F
    if cfg.scatter_strategy == "random":
        dflat = jnp.zeros((L * T * F,), jnp.float32)
        for f in range(F):
            dflat = dflat.at[base + f].add(glfn[:, f, :])
    else:
        # one fused sort over ALL F features' contributions
        idx = jnp.stack([(base + f).reshape(-1) for f in range(F)])
        val = jnp.stack([glfn[:, f, :].reshape(-1) for f in range(F)])
        dflat = scatter_add_flat(L * T * F, idx, val,
                                 cfg.scatter_strategy)
    return dflat.reshape(L, T, F), None, None, None, None, None


hash_encode_stochastic_int8.defvjp(_stoch_int8_fwd, _stoch_int8_bwd)


def encode(table, x, mu, sigma, cfg: HashConfig, key=None,
           stochastic: bool = False, scales=None):
    """Hashed-levels variant dispatcher.  ``stochastic`` (corner variant
    only) uses the unbiased single-corner estimator and requires ``key``.
    With ``cfg.dense_levels`` > 0 this encodes ONLY the hashed levels —
    use :func:`encode_params` for the full feature vector.  ``scales``
    (level-parallel local slice) routes every variant; the stochastic
    paths additionally fold their RNG key by the level-axis index."""
    if cfg.variant == "cell":
        return hash_encode_cell(table, x, mu, sigma, cfg, scales)
    if stochastic:
        if key is None:
            raise ValueError("stochastic hash encoding requires a PRNG key")
        if cfg.packed and cfg.pack_format == "int8":
            return hash_encode_stochastic_int8(table, x, mu, sigma, cfg,
                                               key, scales)
        if cfg.packed and cfg.features_per_level == 2:
            return hash_encode_stochastic_packed(table, x, mu, sigma, cfg,
                                                 key, scales)
        return hash_encode_stochastic(table, x, mu, sigma, cfg, key, scales)
    if (cfg.packed and (cfg.pack_format == "int8"
                        or cfg.features_per_level == 2)
            and ((cfg.packed_eval and cfg.stochastic_train)
                 or cfg.packed_exact_train)):
        # packed word reads for the exact 8-corner trilerp: with
        # stochastic_train this is the eval read (training goes through
        # the stochastic custom-VJP paths above, packed_eval); with
        # packed_exact_train it IS the training forward — exact
        # interpolation over bf16/int8-rounded features with the exact
        # per-corner scatter VJP (the fastest exact-semantics trainable
        # mode; see config.HashConfig.packed_exact_train)
        return hash_encode_packed_exact(table, x, mu, sigma, cfg, scales)
    return hash_encode(table, x, mu, sigma, cfg, scales)


def encode_params(enc_params, x, mu, sigma, cfg: HashConfig, key=None,
                  stochastic: bool = False, scales=None):
    """Encode against the full encoder param dict.

    enc_params: {"table": (L_hashed, T, P)[, "dense": tuple of grids]}
    Feature order: dense (coarsest) levels first, then hashed levels —
    the same coarse-to-fine order as the all-hashed encoding, so the MLP
    sees an identical layout whether or not dense levels are enabled.

    Level parallelism (``cfg.level_axis``; parallel/level_parallel.py):
    the table is this chip's LEVEL SLICE and ``scales`` its matching
    resolutions; the hashed feature blocks are all_gathered along the
    level axis HERE — before concatenation with the dense part, which
    every level-chip computes identically (replicated, MXU-cheap) — so
    the final layout matches the single-chip one exactly.
    """
    parts = []
    if cfg.dense_levels > 0:
        from human_body_reconstruction_tpu.ops import dense_grid

        if "dense" not in enc_params:
            raise ValueError(
                f"cfg.dense_levels={cfg.dense_levels} but encoder params "
                "carry no 'dense' grids (init with init_encoder)")
        use_pallas = cfg.dense_impl == "pallas" or (
            cfg.dense_impl == "auto" and cfg.dense_bf16
            and jax.default_backend() == "tpu")
        if use_pallas:
            from human_body_reconstruction_tpu.ops import dense_pallas

            parts.append(dense_pallas.dense_encode_pallas(
                enc_params["dense"], x, mu, sigma, cfg))
        else:
            parts.append(dense_grid.dense_encode(enc_params["dense"], x, mu,
                                                 sigma, cfg))
    if cfg.num_hashed_levels > 0:
        if cfg.variant == "cp":
            from human_body_reconstruction_tpu.ops import lowrank

            if "lines" not in enc_params:
                raise ValueError(
                    "variant='cp' but encoder params carry no 'lines' "
                    "(init with init_encoder)")
            feats = lowrank.cp_encode(enc_params["lines"], x, mu,
                                      sigma, cfg)
            if cfg.level_axis is not None:
                # RANK parallelism (parallel/level_parallel.py): CP has
                # no lookups to divide, so the sharded axis is the rank
                # axis — this chip's ``lines`` are contiguous
                # (dim, G_l, R/n) rank slices and ``feats`` is
                # (N, L * R/n).  Gather the chips' rank blocks and
                # restore the single-chip level-major/rank-minor column
                # order (contiguous slices, so [l, chip, r_local] is
                # exactly [l, r]).
                g = jax.lax.all_gather(feats, cfg.level_axis)  # (n,N,L*Rl)
                n_ax, n_pts, _ = g.shape
                r_local = enc_params["lines"][0].shape[-1]
                feats = (g.reshape(n_ax, n_pts, cfg.num_hashed_levels,
                                   r_local)
                         .transpose(1, 2, 0, 3)
                         .reshape(n_pts, cfg.num_hashed_levels
                                  * n_ax * r_local))
            parts.append(feats)
        else:
            hashed = encode(enc_params["table"], x, mu, sigma, cfg,
                            key=key, stochastic=stochastic, scales=scales)
            if cfg.level_axis is not None:
                hashed = jax.lax.all_gather(hashed, cfg.level_axis, axis=1,
                                            tiled=True)
            parts.append(hashed)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
