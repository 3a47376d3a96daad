"""Pallas TPU kernel for the CP factor-line two-hot matmul.

Why this kernel exists (measured, docs/PERF_NOTES.md round 3): the XLA
formulation of :func:`ops.lowrank.cp_encode` materialises the two-hot
interpolation matrix ``W (block, sum_G)`` in HBM — XLA cannot fuse a
producer into a dot operand, and at the flagship shapes W is ~47 MB
bf16 per 2048-point block, far over the ~16 MB VMEM budget.  The matmul
itself has arithmetic intensity ~(L*R) FLOP/byte on the W traffic
(~96 at the flagship), under the v5e ridge (~240), so the encode runs
HBM-bound at a fraction of MXU speed.

This kernel never lets W leave the chip:

  * the block-diagonal factor matrices ``M (3, sum_G_pad, C)`` are
    small (~3.5 MB bf16 at the flagship) and stay VMEM-resident for the
    whole grid sweep;
  * per point-tile the kernel rebuilds each axis' W tile in a VMEM
    scratch with the hat-function identity

        w[p, g] = max(0, 1 - |g - x_eff[p]|)

    which reproduces the two-hot lerp row exactly ((1-frac) at x0, frac
    at x0+1) for x_eff = clip(floor(x), 0, G-2) + (x - floor(x)), and
  * feeds the MXU directly: ``T_d = W_d @ M_d`` with f32 accumulation.

The backward pass is a second accumulation kernel (dM_d = W_d^T dT_d,
W rebuilt, contraction over the point tile); positions get no gradient
(the XLA path stop_gradients the fractions — ops/lowrank.py:168).

Per-level line segments are tight-packed at 8-row (sublane) alignment
with only the total padded to 128 ("tight" layout — the W tile is
built per aligned 128-column block as the SUM of the covering levels'
hats, which is exact because a level's hat rows are zero outside its
own segment); the original per-segment 128 alignment ("padded") is
kept for A/B.  Padded rows of M are zero, so stray hat support in the
padding contributes nothing.  The per-axis coordinates are three
separate (B, L) inputs because Mosaic requires a block's trailing dims
to be 128-divisible or whole.

Capability parity: this is an implementation detail of the CP encoder
(see ops/lowrank.py for the capability citation); numerics match the
XLA path to bf16 rounding and are covered by tests/test_cp_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from human_body_reconstruction_tpu.utils.config import HashConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_layout(sizes):
    """Per-level 128-aligned row offsets for the factor matrix.

    Returns (offsets, padded_sizes, total_padded_rows).
    """
    padded = [_round_up(g, 128) for g in sizes]
    offs = np.concatenate([[0], np.cumsum(padded)]).astype(np.int32)
    return [int(o) for o in offs[:-1]], padded, int(offs[-1])


def tight_layout(sizes):
    """Tight-packed layout: per-level rows 8-aligned (Mosaic sublane
    granularity) and only the TOTAL padded to a 128 multiple.

    The flagship ladder's line sizes are 2^k + 2 (floor(scale) + 2
    corners), so per-level 128-alignment pays ~126 dead rows per level:
    the padded_layout executes 4736 rows where the exact work is 4044.
    Tight packing cuts the kernel's executed width to 4096 — a 13.5%
    cut in BOTH the MXU matmul FLOPs and the VPU hat-rebuild work —
    with identical semantics: a level's hat rows are exactly zero
    outside its own [off, off+G) range (|g_local - x_eff| >= 1 at
    g_local = -1 and g_local = G because x_eff is clipped to
    [0, G-2] + frac), so neighbouring segments never contaminate each
    other and the extra zero rows contribute nothing to the matmul
    (residual output diffs vs the padded layout are FMA-grouping-level
    only — tests/test_cp_pallas.py).

    Returns (offsets, aligned_sizes, total_padded_rows).
    """
    aligned = [_round_up(g, 8) for g in sizes]
    offs = np.concatenate([[0], np.cumsum(aligned)]).astype(np.int32)
    return [int(o) for o in offs[:-1]], aligned, _round_up(int(offs[-1]), 128)


def get_layout(sizes, layout: str):
    return tight_layout(sizes) if layout == "tight" else padded_layout(sizes)


def _block_coverage(sizes, offs, total):
    """Static map: for each 128-wide column block of the W scratch, the
    (level, level_row_offset) pairs whose true [off, off+G) row range
    intersects it.  With the padded layout every block is covered by
    at most one level; with the tight layout boundary blocks carry two."""
    cov = []
    for b in range(total // 128):
        lo, hi = b * 128, b * 128 + 128
        cov.append(tuple((l, offs[l]) for l, g in enumerate(sizes)
                         if offs[l] < hi and offs[l] + g > lo))
    return tuple(cov)


# ---------------------------------------------------------------- kernels


def _build_w(w_ref, xl, coverage, bm):
    """Fill the (bm, total) scratch with the two-hot rows of every level
    from per-level effective coordinates ``xl[:, l]``.

    Per 128-wide aligned column block, sum the hat functions of the
    levels covering it (the hat identity w = max(0, 1 - |g - x_eff|)
    reproduces the two-hot lerp row exactly and is exactly zero outside
    the level's own row range, so the sum never mixes levels).  One
    (bm, 128) f32 iota is built once and reused by every block — the
    per-segment iota+cast of the first kernel version was ~2 of the
    ~7 VPU passes per element of this (build-bound) kernel."""
    # Mosaic's tpu.iota is integer-only; cast to f32 for the hat
    iota = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1
                                    ).astype(jnp.float32)
    for b, cov in enumerate(coverage):
        acc = None
        for l, off in cov:
            # hat centre in block-local coordinates
            xc = xl[:, l:l + 1] - float(b * 128 - off)          # (bm, 1)
            hat = jnp.maximum(0.0, 1.0 - jnp.abs(iota - xc))    # (bm, 128)
            acc = hat if acc is None else acc + hat
        if acc is None:                      # tail block past every level
            acc = jnp.zeros((bm, 128), jnp.float32)
        w_ref[:, b * 128:(b + 1) * 128] = acc.astype(jnp.bfloat16)


def _fwd_kernel(xa_ref, xb_ref, xc_ref, mat_ref, out_ref, *w_refs,
                coverage, bm):
    """Single-sweep forward.  With TWO W scratches (``len(w_refs)==2``)
    consecutive axes alternate buffers, so axis d+1's VPU hat build has
    no data dependency on axis d's MXU matmul and the scheduler is free
    to overlap them — the build is the co-dominant cost of this kernel
    (~5 VPU passes per element vs a 2*C_pad/128-FLOP-per-element matmul)."""
    nw = len(w_refs)
    for d, x_ref in enumerate((xa_ref, xb_ref, xc_ref)):
        w_ref = w_refs[d % nw]
        _build_w(w_ref, x_ref[:], coverage, bm)
        out_ref[d] = jnp.dot(w_ref[:], mat_ref[d],
                             preferred_element_type=jnp.float32)


def _fwd_kernel_axis(xa_ref, xb_ref, xc_ref, mat_ref, out_ref, w_ref, *,
                     coverage, bm):
    """Per-axis forward (grid (3, nb)): only ONE axis' factor block is
    VMEM-resident — the all-axes mat block (3, total, C_pad) bf16 alone
    is 10.9 MB at rank 48 and the whole stack measures 18.18 MB, over
    Mosaic's 16 MB scoped-VMEM limit."""
    d = pl.program_id(0)
    for dd, x_ref in enumerate((xa_ref, xb_ref, xc_ref)):
        @pl.when(d == dd)
        def _():
            _build_w(w_ref, x_ref[:], coverage, bm)
    out_ref[0] = jnp.dot(w_ref[:], mat_ref[0],
                         preferred_element_type=jnp.float32)


def _bwd_kernel(xa_ref, xb_ref, xc_ref, dt_ref, dm_ref, w_ref, *,
                coverage, bm, i_axis=1):
    """Grid (3, nb) — or (3, n_cb, nb) when the dM accumulator block is
    split over column tiles (``i_axis=2``): one axis at a time keeps the
    block a third of the all-axes version, and the column split bounds
    dM + its contrib intermediate, whose sum overflows Mosaic's 16 MB
    scoped-VMEM stack at rank 48 (C_pad 384, measured 16.61 MB)."""
    d = pl.program_id(0)
    i = pl.program_id(i_axis)
    for dd, x_ref in enumerate((xa_ref, xb_ref, xc_ref)):
        @pl.when(d == dd)
        def _():
            _build_w(w_ref, x_ref[:], coverage, bm)

    contrib = jax.lax.dot_general(
        w_ref[:], dt_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (sumG, C)

    @pl.when(i == 0)
    def _():
        dm_ref[0] = contrib

    @pl.when(i > 0)
    def _():
        dm_ref[0] = dm_ref[0] + contrib


# ------------------------------------------------------------- dispatch


@functools.lru_cache(maxsize=32)
def _pallas_calls(sizes, b_pad: int, c_pad: int, bm_f: int, bm_b: int,
                  interpret: bool, layout: str = "tight",
                  fwd_db: bool = True):
    """Build the fwd/bwd pallas_call callables for one static layout.

    Forward and backward take separate point-tile sizes: on the v5e the
    forward is fastest at 256 and the backward (whose accumulator block
    is revisited, so bigger tiles amortise more) at 512
    (pallas_ab.json); b_pad must be a multiple of both.

    ``layout``: "tight" (8-aligned segments, 13.5% fewer executed rows
    at the flagship ladder — see tight_layout) or the original "padded"
    (per-segment 128 alignment).  ``fwd_db``: double-buffer the forward
    W scratch so consecutive axes' builds/matmuls can overlap.
    """
    offs, padded, total = get_layout(sizes, layout)
    coverage = _block_coverage(sizes, offs, total)
    n_lvl = len(sizes)
    cost = pl.CostEstimate(
        flops=2 * 3 * b_pad * total * c_pad,
        bytes_accessed=3 * b_pad * (n_lvl * 4 + c_pad * 4),
        transcendentals=0)

    # forward scoped-VMEM stack: all-axes mat block + W scratch(es) +
    # out block + the f32 hat/iota temporaries of one 128-block (~2x).
    # Past ~15.5 MB (rank 48 measures 18.18 MB > the 16 MB limit) the
    # grid splits per axis so only one axis' factor block is resident;
    # rank <= 32 keeps the original single-sweep formulation.
    n_w = 2 if fwd_db else 1
    fwd_stack = (3 * total * c_pad * 2 + n_w * bm_f * total * 2
                 + 3 * bm_f * c_pad * 4 + 2 * bm_f * 128 * 4)
    if fwd_stack <= 15.5e6:
        x_spec = pl.BlockSpec((bm_f, n_lvl), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((3, total, c_pad), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((3, bm_f, c_pad), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        fwd = pl.pallas_call(
            functools.partial(_fwd_kernel, coverage=coverage, bm=bm_f),
            grid=(b_pad // bm_f,),
            in_specs=[x_spec, x_spec, x_spec, mat_spec],
            out_specs=t_spec,
            out_shape=jax.ShapeDtypeStruct((3, b_pad, c_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm_f, total), jnp.bfloat16)
                            for _ in range(n_w)],
            interpret=interpret,
            cost_estimate=cost,
        )
    else:
        x_spec = pl.BlockSpec((bm_f, n_lvl), lambda d, i: (i, 0),
                              memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((1, total, c_pad), lambda d, i: (d, 0, 0),
                                memory_space=pltpu.VMEM)
        t_spec = pl.BlockSpec((1, bm_f, c_pad), lambda d, i: (d, i, 0),
                              memory_space=pltpu.VMEM)
        fwd = pl.pallas_call(
            functools.partial(_fwd_kernel_axis, coverage=coverage,
                              bm=bm_f),
            grid=(3, b_pad // bm_f),
            in_specs=[x_spec, x_spec, x_spec, mat_spec],
            out_specs=t_spec,
            out_shape=jax.ShapeDtypeStruct((3, b_pad, c_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm_f, total), jnp.bfloat16)],
            interpret=interpret,
            cost_estimate=cost,
        )

    # bwd sweeps (axis, point-tile): i fastest, so each axis' dM block
    # accumulates to completion before the next axis is visited.  The
    # backward's scoped-VMEM stack is W scratch + dM block + the contrib
    # intermediate + the dt block; past ~15.5 MB (estimated — rank 48 at
    # full width measures 16.61 MB > the 16 MB Mosaic limit) the dM and
    # dt blocks are split over column tiles with a middle grid axis.
    # When the full width fits (rank <= 32) the grid/specs below are
    # byte-identical to the original 2-D formulation.
    def bwd_stack(cbw):
        return (bm_b * total * 2 + 2 * total * cbw * 4 + bm_b * cbw * 4)

    cbw = c_pad
    while cbw > 128 and bwd_stack(cbw) > 15.5e6:
        cbw = max(128, ((cbw // 2 + 127) // 128) * 128)
        while c_pad % cbw:
            cbw -= 128
    n_cb = c_pad // cbw

    if n_cb == 1:
        x_spec_b = pl.BlockSpec((bm_b, n_lvl), lambda d, i: (i, 0),
                                memory_space=pltpu.VMEM)
        dt_spec = pl.BlockSpec((1, bm_b, c_pad), lambda d, i: (d, i, 0),
                               memory_space=pltpu.VMEM)
        dm_spec = pl.BlockSpec((1, total, c_pad), lambda d, i: (d, 0, 0),
                               memory_space=pltpu.VMEM)
        grid = (3, b_pad // bm_b)
        i_axis = 1
    else:
        # column tiles on the middle axis, point tiles innermost: each
        # (axis, column-block) dM block stays resident across the whole
        # point sweep; W is rebuilt per step either way (it depends on
        # the point tile), so the split costs n_cb x the VPU rebuilds
        # and nothing else
        x_spec_b = pl.BlockSpec((bm_b, n_lvl), lambda d, cb, i: (i, 0),
                                memory_space=pltpu.VMEM)
        dt_spec = pl.BlockSpec((1, bm_b, cbw), lambda d, cb, i: (d, i, cb),
                               memory_space=pltpu.VMEM)
        dm_spec = pl.BlockSpec((1, total, cbw), lambda d, cb, i: (d, 0, cb),
                               memory_space=pltpu.VMEM)
        grid = (3, n_cb, b_pad // bm_b)
        i_axis = 2

    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, coverage=coverage, bm=bm_b,
                          i_axis=i_axis),
        grid=grid,
        in_specs=[x_spec_b, x_spec_b, x_spec_b, dt_spec],
        out_specs=dm_spec,
        out_shape=jax.ShapeDtypeStruct((3, total, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm_b, total), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=cost,
    )
    return fwd, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _cp_matmul(xa, xb, xc, mats, sizes, bm_f, bm_b, interpret, layout,
               fwd_db):
    """T[d] = W(x_d) @ mats[d] for the three axes.

    xa/xb/xc: (B_pad, L) f32 per-level effective coordinates per axis.
    mats: (3, sum_G_pad, C_pad) bf16 block-diagonal factor matrices.
    Returns (3, B_pad, C_pad) f32.
    """
    fwd, _ = _pallas_calls(sizes, xa.shape[0], mats.shape[-1], bm_f, bm_b,
                           interpret, layout, fwd_db)
    return fwd(xa, xb, xc, mats)


def _cp_matmul_fwd(xa, xb, xc, mats, sizes, bm_f, bm_b, interpret, layout,
                   fwd_db):
    t = _cp_matmul(xa, xb, xc, mats, sizes, bm_f, bm_b, interpret, layout,
                   fwd_db)
    return t, (xa, xb, xc, mats.shape[-1])


def _cp_matmul_bwd(sizes, bm_f, bm_b, interpret, layout, fwd_db, res, dt):
    xa, xb, xc, c_pad = res
    _, bwd = _pallas_calls(sizes, xa.shape[0], c_pad, bm_f, bm_b,
                           interpret, layout, fwd_db)
    dm = bwd(xa, xb, xc, dt)
    return (jnp.zeros_like(xa), jnp.zeros_like(xb), jnp.zeros_like(xc),
            dm.astype(jnp.bfloat16))


_cp_matmul.defvjp(_cp_matmul_fwd, _cp_matmul_bwd)


def vmem_estimate_bytes(sizes, c_pad: int, bm: int,
                        layout: str = "tight") -> int:
    """Rough VMEM budget of one kernel step (scratch + resident blocks)."""
    _, _, total = get_layout(sizes, layout)
    w = bm * total * 2
    mat = 3 * total * c_pad * 2
    dm = 3 * total * c_pad * 4
    t = 3 * bm * c_pad * 4
    return w + mat + dm + t


def cp_encode_pallas(lines, x, mu, sigma, cfg: HashConfig,
                     block: int = 0, block_bwd: int = 0,
                     chunk: int = 0, interpret: bool = False,
                     layout: str = None, fwd_db: bool = None):
    """Drop-in replacement for :func:`ops.lowrank.cp_encode` running the
    two-hot matmuls as Pallas kernels (see module docstring).

    Semantics match cp_encode exactly (same clamping, bf16 operands,
    f32 accumulation, stop_gradient'ed fractions -> no position grads).
    ``block``/``block_bwd`` are the fwd/bwd point-tile sizes (0 = the
    measured v5e defaults 256/512, pallas_ab.json).

    ``chunk`` bounds the per-call point count: the kernel's T
    intermediate is (3, N, C_pad) f32, and at rank 32 / N=2.1M (the
    unculled 128-sample warmup step) the fwd+bwd residual set exceeds
    the chip's 16 GB HBM — the AOT compile helper crashes during
    allocation planning (bisect_r32.json).  Beyond ``chunk`` points the
    encode runs as a rematerialised lax.map over point chunks (the
    backward recomputes each chunk's T instead of saving it).  The
    default (0) scales the cap with the column width so the f+b
    residual set stays ~11 GB — the flagship culled paths (<=1M points
    at rank<=32, <=786k at rank 48) stay single-chunk and pay nothing.
    """
    from human_body_reconstruction_tpu.ops import lowrank
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    # off-TPU there is no Mosaic backend: run the kernel interpreted
    # (tests exercise the exact kernel logic this way)
    interpret = interpret or jax.default_backend() != "tpu"
    if layout is None:
        layout = getattr(cfg, "cp_layout", "tight")
    if fwd_db is None:
        fwd_db = getattr(cfg, "cp_fwd_db", True)
    n_lvl = len(lines)
    assert n_lvl == cfg.num_levels - cfg.dense_levels
    rank = lines[0].shape[-1]
    sizes = tuple(lowrank.cp_line_sizes(cfg))
    offs, _padded, total = get_layout(sizes, layout)
    c = n_lvl * rank
    c_pad = _round_up(c, 128)
    scales = np.asarray(level_scales(cfg)[cfg.dense_levels:], np.float32)

    n = x.shape[0]
    xn = (x.astype(jnp.float32) - mu) / sigma                  # (N, 3)

    # per-(axis, level) effective coordinates: clip(floor, 0, G-2) + frac
    xl = xn[:, :, None] * jnp.asarray(scales)[None, None, :]   # (N, 3, L)
    x0f = jnp.floor(xl)
    frac = jax.lax.stop_gradient(jnp.clip(xl - x0f, 0.0, 1.0))
    gmax = jnp.asarray([g - 2 for g in sizes], jnp.float32)
    xe = jnp.clip(x0f, 0.0, gmax[None, None, :]) + frac        # (N, 3, L)

    bm_f = block or 256
    bm_b = block_bwd or max(bm_f, 512)
    lcm = bm_f * bm_b // math.gcd(bm_f, bm_b)
    if chunk <= 0:
        # residual set ~ 3 copies of the (3, chunk, c_pad) f32 T
        # (saved T / recomputed T + dT + slack): cap it at ~11 GB
        chunk = int(11e9 / (36 * c_pad))
    chunk = max(lcm, (chunk // lcm) * lcm)
    pad = (-n) % (lcm if n <= chunk else chunk)
    if pad:
        xe = jnp.pad(xe, ((0, pad), (0, 0), (0, 0)))

    # block-diagonal factor matrices, 128-aligned per level segment
    mats = jnp.zeros((3, total, c_pad), jnp.float32)
    for l, ln in enumerate(lines):
        mats = jax.lax.dynamic_update_slice(
            mats, ln.astype(jnp.float32), (0, offs[l], l * rank))
    mats = mats.astype(jnp.bfloat16)

    def encode_chunk(xc, mats):
        t = _cp_matmul(xc[:, 0, :], xc[:, 1, :], xc[:, 2, :], mats,
                       sizes, bm_f, bm_b, interpret, layout,
                       fwd_db)                                 # (3,Np,Cp)
        return t[0] * t[1] * t[2]

    n_pad = xe.shape[0]
    if n_pad <= chunk:
        out = encode_chunk(xe, mats)
    else:
        xc = xe.reshape(n_pad // chunk, chunk, 3, xe.shape[-1])
        out = jax.lax.map(
            lambda xb: jax.checkpoint(encode_chunk)(xb, mats), xc
        ).reshape(n_pad, -1)
    return out[:n, :c]
