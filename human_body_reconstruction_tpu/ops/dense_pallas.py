"""Pallas TPU kernel for the dense coarse-level tensor-product trilerp.

Why (measured, encode_micro_r4.json): the XLA formulation in
:mod:`ops.dense_grid` materialises the pair-weight matrix
``W_yz (block, G^2)`` in HBM — a dot operand cannot be fused into its
producer — and at the flagship shapes the two tiny coarse grids cost
31.9 ms of a 169 ms step, all of it HBM traffic on an array that is
recomputable from 2 floats per (point, level).  Same sin, same fix as
the CP kernel (ops/cp_pallas.py): rebuild the operand tile-by-tile in
VMEM and never let it touch HBM.

This kernel goes further than the CP one — the whole per-level
contraction lives in one kernel body, so the ONLY HBM traffic is the
points in and the (N, D*F) features out:

  * all dense levels' ``(G^2, G*F)`` matrices are packed block-diagonal
    into one ``mat (rows_pad, c_pad)`` bf16 operand, VMEM-resident for
    the whole sweep (tens of KB at coarse G);
  * per point-tile the kernel rebuilds the pair-weight tile
    ``w[p, r] = hat(j(r) - y_eff[p]) * hat(k(r) - z_eff[p])`` where
    ``r = j*G + k`` decodes with an integer iota (hat(t) =
    max(0, 1-|t|) is exactly the two-hot lerp row, and is exactly zero
    for the out-of-level padding rows because j(r) >= G there);
  * one MXU matmul gives ``T = W_yz @ mat`` — ``T[p, i*F+f]`` per
    level's column block;
  * the third-axis contraction ``out[p,f] = sum_i hat_x[p,i] * T[p,i,f]``
    runs in-kernel as a VPU mask-multiply followed by a matmul with a
    constant binary fold matrix ``S[c, l*F + (c mod F)] = 1`` (a strided
    lane reduction is not expressible in Mosaic; a (c_pad, 128) matmul
    is ~free).

Backward is one accumulation kernel per point-tile:
``dT = (dOut @ S^T) * hat_x`` rebuilt in VMEM, then
``dmat += W_yz^T @ dT`` into a VMEM-resident accumulator; positions get
no gradient (the XLA path stop_gradients the fractions —
ops/dense_grid.py:114).

Capability parity: implementation detail of the dense coarse levels
(capability citation in ops/dense_grid.py); numerics match the XLA path
to bf16 rounding (tests/test_dense_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from human_body_reconstruction_tpu.utils.config import HashConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dense_layout(g_sizes, f: int):
    """Static layout of the fused block-diagonal operand.

    Rows: level l's G_l^2 pair-weight rows, 8-aligned (Mosaic sublane
    granularity), total padded to 128.  Cols: level l's G_l*F feature
    columns, packed tight, total padded to 128.

    Returns (row_offs, col_offs, rows_pad, c_pad).
    """
    row_offs, col_offs = [], []
    r = c = 0
    for g in g_sizes:
        row_offs.append(r)
        col_offs.append(c)
        r += _round_up(g * g, 8)
        c += g * f
    return row_offs, col_offs, _round_up(r, 128), _round_up(c, 128)


def _fold_matrix(g_sizes, f: int, c_pad: int):
    """(c_pad, 128) binary fold: column ``c`` of level l (i = (c-off)//F,
    feat = (c-off) % F) folds into output column l*F + feat."""
    _, col_offs, _, _ = dense_layout(g_sizes, f)
    s = np.zeros((c_pad, 128), np.float32)
    for l, g in enumerate(g_sizes):
        off = col_offs[l]
        for c in range(g * f):
            s[off + c, l * f + c % f] = 1.0
    return s


# ---------------------------------------------------------------- kernels


def _build_pair_w(w_ref, ye, ze, g_sizes, row_offs, rows_pad, bm):
    """Fill the (bm, rows_pad) scratch with every level's pair-weight
    rows: w[p, off_l + j*G + k] = hat(j - ye_l[p]) * hat(k - ze_l[p]).

    Per 128-wide aligned column block, decode (j, k) from an integer
    iota and sum the covering levels' hat products — a level's rows are
    exactly zero outside its own [off, off + G^2) range (j >= G or a
    negative trunc-div j/k puts the hat past its unit support), so the
    sum never mixes levels and the 8-alignment padding rows contribute
    nothing (matching zero rows of the mat operand anyway)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (bm, 128), 1)
    for b in range(rows_pad // 128):
        acc = None
        for l, g in enumerate(g_sizes):
            off = row_offs[l]
            if off >= b * 128 + 128 or off + g * g <= b * 128:
                continue
            r = iota + (b * 128 - off)                       # (bm, 128) int
            j = r // g
            k = r - j * g
            hy = jnp.maximum(
                0.0, 1.0 - jnp.abs(j.astype(jnp.float32) - ye[:, l:l + 1]))
            hz = jnp.maximum(
                0.0, 1.0 - jnp.abs(k.astype(jnp.float32) - ze[:, l:l + 1]))
            hat = hy * hz
            acc = hat if acc is None else acc + hat
        if acc is None:
            acc = jnp.zeros((bm, 128), jnp.float32)
        w_ref[:, b * 128:(b + 1) * 128] = acc.astype(jnp.bfloat16)


def _fwd_kernel(xe_ref, ye_ref, ze_ref, mat_ref, s_ref, out_ref, w_ref, *,
                g_sizes, row_offs, col_offs, rows_pad, c_pad, f, bm):
    """One point-tile: build W_yz, T = W_yz @ mat, fold the third axis."""
    _build_pair_w(w_ref, ye_ref[:], ze_ref[:], g_sizes, row_offs,
                  rows_pad, bm)
    t = jnp.dot(w_ref[:], mat_ref[:],
                preferred_element_type=jnp.float32)            # (bm, c_pad)
    hx = _hat_x(xe_ref[:], g_sizes, col_offs, c_pad, f, bm)
    out_ref[:, :] = jnp.dot((t * hx).astype(jnp.bfloat16),
                            s_ref[:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)


def _hat_x(xe, g_sizes, col_offs, c_pad, f, bm):
    """(bm, c_pad) f32 third-axis hat weights (see _fwd_kernel)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (bm, c_pad), 1)
    out = jnp.zeros((bm, c_pad), jnp.float32)
    for l, g in enumerate(g_sizes):
        off = col_offs[l]
        i = (iota - off) // f
        hat = jnp.maximum(
            0.0, 1.0 - jnp.abs(i.astype(jnp.float32) - xe[:, l:l + 1]))
        mask = ((iota >= off) & (iota < off + g * f)).astype(jnp.float32)
        out = out + hat * mask
    return out


def _bwd_kernel(xe_ref, ye_ref, ze_ref, dout_ref, s_ref, dm_ref, w_ref, *,
                g_sizes, row_offs, col_offs, rows_pad, c_pad, f, bm):
    """Accumulate dmat = sum_tiles W_yz^T @ ((dOut @ S^T) * hat_x)."""
    i = pl.program_id(0)
    _build_pair_w(w_ref, ye_ref[:], ze_ref[:], g_sizes, row_offs,
                  rows_pad, bm)
    dt = jax.lax.dot_general(
        dout_ref[:].astype(jnp.bfloat16), s_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (bm, c_pad)
    dt = dt * _hat_x(xe_ref[:], g_sizes, col_offs, c_pad, f, bm)
    contrib = jax.lax.dot_general(
        w_ref[:], dt.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (rows, c)

    @pl.when(i == 0)
    def _():
        dm_ref[:, :] = contrib

    @pl.when(i > 0)
    def _():
        dm_ref[:, :] = dm_ref[:, :] + contrib


# ------------------------------------------------------------- dispatch


@functools.lru_cache(maxsize=32)
def _pallas_calls(g_sizes, f: int, b_pad: int, bm_f: int, bm_b: int,
                  interpret: bool):
    row_offs, col_offs, rows_pad, c_pad = dense_layout(list(g_sizes), f)
    kw = dict(g_sizes=tuple(g_sizes), row_offs=tuple(row_offs),
              col_offs=tuple(col_offs), rows_pad=rows_pad, c_pad=c_pad, f=f)
    cost = pl.CostEstimate(
        flops=2 * b_pad * rows_pad * c_pad,
        bytes_accessed=b_pad * (3 * len(g_sizes) * 4 + 128 * 4),
        transcendentals=0)

    x_spec_f = pl.BlockSpec((bm_f, len(g_sizes)), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((rows_pad, c_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((c_pad, 128), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm_f, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, bm=bm_f, **kw),
        grid=(b_pad // bm_f,),
        in_specs=[x_spec_f, x_spec_f, x_spec_f, mat_spec, s_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm_f, rows_pad), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=cost,
    )

    x_spec_b = pl.BlockSpec((bm_b, len(g_sizes)), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dout_spec = pl.BlockSpec((bm_b, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    dm_spec = pl.BlockSpec((rows_pad, c_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, bm=bm_b, **kw),
        grid=(b_pad // bm_b,),
        in_specs=[x_spec_b, x_spec_b, x_spec_b, dout_spec, s_spec],
        out_specs=dm_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm_b, rows_pad), jnp.bfloat16)],
        interpret=interpret,
        cost_estimate=cost,
    )
    return fwd, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _dense_matmul(xe, ye, ze, mat, g_sizes, f, bm_f, bm_b, interpret):
    """out[p, l*F + feat] for all dense levels in one kernel sweep.

    xe/ye/ze: (B_pad, D) f32 per-level effective coordinates per axis.
    mat: (rows_pad, c_pad) bf16 block-diagonal level matrices.
    Returns (B_pad, 128) f32 (valid cols: D*F).
    """
    fwd, _ = _pallas_calls(g_sizes, f, xe.shape[0], bm_f, bm_b, interpret)
    _, _, _, c_pad = dense_layout(list(g_sizes), f)
    s = jnp.asarray(_fold_matrix(list(g_sizes), f, c_pad))
    return fwd(xe, ye, ze, mat, s)


def _dense_matmul_fwd(xe, ye, ze, mat, g_sizes, f, bm_f, bm_b, interpret):
    out = _dense_matmul(xe, ye, ze, mat, g_sizes, f, bm_f, bm_b, interpret)
    return out, (xe, ye, ze)


def _dense_matmul_bwd(g_sizes, f, bm_f, bm_b, interpret, res, dout):
    xe, ye, ze = res
    _, bwd = _pallas_calls(g_sizes, f, xe.shape[0], bm_f, bm_b, interpret)
    _, _, _, c_pad = dense_layout(list(g_sizes), f)
    s = jnp.asarray(_fold_matrix(list(g_sizes), f, c_pad))
    dm = bwd(xe, ye, ze, dout, s)
    return (jnp.zeros_like(xe), jnp.zeros_like(ye), jnp.zeros_like(ze),
            dm.astype(jnp.bfloat16))


_dense_matmul.defvjp(_dense_matmul_fwd, _dense_matmul_bwd)


def dense_encode_pallas(grids, x, mu, sigma, cfg: HashConfig,
                        block: int = 0, block_bwd: int = 0,
                        interpret: bool = False):
    """Drop-in replacement for :func:`ops.dense_grid.dense_encode`
    running the tensor-product trilerp fully in-kernel (module docstring).

    Semantics match dense_encode with bf16 compute (same clamping, bf16
    operands, f32 accumulation, stop_gradient'ed fractions -> no
    position grads); output is f32 (the XLA path returns grid dtype).
    """
    from human_body_reconstruction_tpu.ops.hash_encoding import level_scales

    interpret = interpret or jax.default_backend() != "tpu"
    assert cfg.dim == 3 and len(grids) == cfg.dense_levels
    f = cfg.features_per_level
    g_sizes = tuple(g.shape[0] for g in grids)
    row_offs, col_offs, rows_pad, c_pad = dense_layout(list(g_sizes), f)
    scales = np.asarray(level_scales(cfg)[:cfg.dense_levels], np.float32)

    n = x.shape[0]
    xn = (x.astype(jnp.float32) - mu) / sigma                  # (N, 3)
    xl = xn[:, :, None] * jnp.asarray(scales)[None, None, :]   # (N, 3, D)
    x0f = jnp.floor(xl)
    frac = jax.lax.stop_gradient(jnp.clip(xl - x0f, 0.0, 1.0))
    gmax = jnp.asarray([g - 2 for g in g_sizes], jnp.float32)
    xe = jnp.clip(x0f, 0.0, gmax[None, None, :]) + frac        # (N, 3, D)

    bm_f = block or 256
    bm_b = block_bwd or max(bm_f, 512)
    lcm = bm_f * bm_b // np.gcd(bm_f, bm_b)
    pad = (-n) % lcm
    if pad:
        xe = jnp.pad(xe, ((0, pad), (0, 0), (0, 0)))

    # block-diagonal per-level (G^2, G*F) matrices (transpose matches
    # ops/dense_grid.py:124 — rows are (j, k), cols (i, feat))
    mat = jnp.zeros((rows_pad, c_pad), jnp.float32)
    for l, g in enumerate(grids):
        gg = g.shape[0]
        m = g.astype(jnp.float32).transpose(1, 2, 0, 3).reshape(
            gg * gg, gg * f)
        mat = jax.lax.dynamic_update_slice(mat, m, (row_offs[l],
                                                    col_offs[l]))
    mat = mat.astype(jnp.bfloat16)

    out = _dense_matmul(xe[:, 0, :], xe[:, 1, :], xe[:, 2, :], mat,
                        g_sizes, f, bm_f, bm_b, interpret)
    return out[:n, :cfg.dense_levels * f]
