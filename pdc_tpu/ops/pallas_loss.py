"""Fused Pallas kernel for the pooled (matrix) non-match hinge loss.

The XLA formulation of :func:`pdc_tpu.losses.matrix_loss.pooled_non_match_loss_from_rows`
materializes a chain of [Nm, P] fp32 intermediates in HBM (cross, d2, dist,
hinge, du, dv, collision and validity masks — each 40 MB at the shipped
Nm=10000, P=1024, x8 pairs) in both the forward and the backward pass.
Ablation on v5e (live vs constant-folded index chains) attributes ~45 ms of
the 133 ms train step to exactly this traffic.

This kernel computes the whole thing tile-by-tile in VMEM:

    forward:  loss = sum_ij w_ij * max(M - ||da_i - db_j||, 0)^2 [* pixw_ij]
              hard = sum_ij w_ij * [hinge_ij > 0]
    backward: grad_da_i = sum_j c_ij (da_i - db_j)
              grad_db_j = -sum_i c_ij (da_i - db_j)
              with c_ij = -2 w_ij pixw_ij hinge_ij / dist_ij

where w_ij folds match validity, pool validity, and the reference's
collision rule (pool pixel within 1 px of the row's true match in u OR v,
``correspondence_finder.py:339-372``). The distance cross-term and both
backward contractions ride the MXU; HBM traffic is one read of the row sets
(da [Nm,D], db [P,D], pixel coords) and one write of the row-shaped grads —
nothing [Nm, P]-shaped ever leaves VMEM. The backward recomputes the tile
instead of saving residuals (FLOPs are ~free here; bandwidth is not).

Exposed as :func:`pooled_hinge` with a custom VJP; the XLA formulation
remains the reference implementation and the off-TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512  # match rows per grid step


def _fwd_kernel(da_ref, db_ref, mu_ref, mv_ref, mvalid_ref,
                pu_ref, pv_ref, pvalid_ref,
                loss_ref, hard_ref, *, M, use_pix, M_pixel):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        loss_ref[:] = jnp.zeros_like(loss_ref[:])
        hard_ref[:] = jnp.zeros_like(hard_ref[:])

    da = da_ref[:]                      # [TM, D]
    db = db_ref[:]                      # [P, D]
    cross = jax.lax.dot_general(
        da, db, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                   # [TM, P]
    d2 = (jnp.sum(da * da, axis=1, keepdims=True)
          - 2.0 * cross
          + jnp.sum(db * db, axis=1)[None, :])
    dist = jnp.sqrt(jnp.maximum(d2, 1e-24))
    hinge = jnp.maximum(M - dist, 0.0)

    du = jnp.abs(mu_ref[:] - pu_ref[:])     # [TM,1]-[1,P] -> [TM, P]
    dv = jnp.abs(mv_ref[:] - pv_ref[:])
    w = (mvalid_ref[:] * pvalid_ref[:]
         * (1.0 - ((du < 1.0) | (dv < 1.0)).astype(jnp.float32)))

    sq = w * hinge * hinge
    if use_pix:
        pix = jnp.sqrt(du * du + dv * dv)
        sq = sq * (jnp.minimum(pix, M_pixel) / M_pixel)
    loss_ref[:] = loss_ref[:] + jnp.sum(sq).reshape(1, 1)
    hard_ref[:] = hard_ref[:] + jnp.sum(
        w * (hinge > 0.0).astype(jnp.float32)).reshape(1, 1)


def _bwd_kernel(da_ref, db_ref, mu_ref, mv_ref, mvalid_ref,
                pu_ref, pv_ref, pvalid_ref,
                gda_ref, gdb_ref, *, M, use_pix, M_pixel):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        gdb_ref[:] = jnp.zeros_like(gdb_ref[:])

    da = da_ref[:]
    db = db_ref[:]
    cross = jax.lax.dot_general(
        da, db, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = (jnp.sum(da * da, axis=1, keepdims=True)
          - 2.0 * cross
          + jnp.sum(db * db, axis=1)[None, :])
    dist = jnp.sqrt(jnp.maximum(d2, 1e-24))
    hinge = jnp.maximum(M - dist, 0.0)

    du = jnp.abs(mu_ref[:] - pu_ref[:])
    dv = jnp.abs(mv_ref[:] - pv_ref[:])
    w = (mvalid_ref[:] * pvalid_ref[:]
         * (1.0 - ((du < 1.0) | (dv < 1.0)).astype(jnp.float32)))
    if use_pix:
        pix = jnp.sqrt(du * du + dv * dv)
        w = w * (jnp.minimum(pix, M_pixel) / M_pixel)

    # dL/d dist = -2 w hinge; d dist/d da_i = (da_i - db_j)/dist. The d2
    # clamp zeroes the gradient (matching autodiff of max(d2, 1e-24)).
    c = jnp.where((hinge > 0.0) & (d2 > 1e-24),
                  (-2.0 * w * hinge) / dist, 0.0)  # [TM, P]

    crow = jnp.sum(c, axis=1, keepdims=True)       # [TM, 1]
    gda_ref[:] = crow * da - jax.lax.dot_general(
        c, db, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ccol = jnp.sum(c, axis=0)[:, None]             # [P, 1]
    gdb_ref[:] += jax.lax.dot_general(
        c, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * (-1.0) + ccol * db


def _pad_rows(x, n_pad):
    if n_pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)], axis=0)


@functools.partial(
    jax.jit, static_argnames=("M", "use_pix", "M_pixel", "interpret"))
def _pooled_hinge_fwd_call(da, db, mu, mv, mvalid, pu, pv, pvalid,
                           M, use_pix, M_pixel, interpret):
    Nm, D = da.shape
    P = db.shape[0]
    TM = min(TILE_M, Nm)
    pad = (-Nm) % TM
    da = _pad_rows(da, pad)
    mu = _pad_rows(mu, pad)
    mv = _pad_rows(mv, pad)
    mvalid = _pad_rows(mvalid, pad)
    grid = ((Nm + pad) // TM,)
    kern = functools.partial(_fwd_kernel, M=M, use_pix=use_pix,
                             M_pixel=M_pixel)
    loss, hard = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(da, db, mu[:, None], mv[:, None], mvalid[:, None],
      pu[None, :], pv[None, :], pvalid[None, :])
    return loss[0, 0], hard[0, 0]


@functools.partial(
    jax.jit, static_argnames=("M", "use_pix", "M_pixel", "interpret"))
def _pooled_hinge_bwd_call(da, db, mu, mv, mvalid, pu, pv, pvalid,
                           M, use_pix, M_pixel, interpret):
    Nm, D = da.shape
    P = db.shape[0]
    TM = min(TILE_M, Nm)
    pad = (-Nm) % TM
    da_p = _pad_rows(da, pad)
    mu_p = _pad_rows(mu, pad)
    mv_p = _pad_rows(mv, pad)
    mvalid_p = _pad_rows(mvalid, pad)
    grid = ((Nm + pad) // TM,)
    kern = functools.partial(_bwd_kernel, M=M, use_pix=use_pix,
                             M_pixel=M_pixel)
    gda, gdb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Nm + pad, D), jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
        ],
        interpret=interpret,
    )(da_p, db, mu_p[:, None], mv_p[:, None], mvalid_p[:, None],
      pu[None, :], pv[None, :], pvalid[None, :])
    return gda[:Nm], gdb


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def pooled_hinge(da, db, mu, mv, mvalid, pu, pv, pvalid,
                 M: float, use_pix: bool, M_pixel: float,
                 interpret: bool = False):
    """Fused pooled non-match hinge.

    :param da: [Nm, D] float32 match descriptor rows (image a)
    :param db: [P, D] float32 pool descriptor rows (image b)
    :param mu, mv: [Nm] float32 pixel coords of each row's TRUE match in b
    :param mvalid: [Nm] float32 1/0 row validity
    :param pu, pv: [P] float32 pool pixel coords
    :param pvalid: [P] float32 1/0 pool validity
    :return: (loss_sum, num_hard) — float32 scalars; ``num_hard`` is
        non-differentiable (zero tangent), matching the count semantics of
        the XLA formulation.
    """
    return _pooled_hinge_fwd_call(da, db, mu, mv, mvalid, pu, pv, pvalid,
                                  M, use_pix, M_pixel, interpret)


def _vjp_fwd(da, db, mu, mv, mvalid, pu, pv, pvalid,
             M, use_pix, M_pixel, interpret=False):
    out = _pooled_hinge_fwd_call(da, db, mu, mv, mvalid, pu, pv, pvalid,
                                 M, use_pix, M_pixel, interpret)
    return out, (da, db, mu, mv, mvalid, pu, pv, pvalid)


def _vjp_bwd(M, use_pix, M_pixel, interpret, res, g):
    da, db, mu, mv, mvalid, pu, pv, pvalid = res
    g_loss, _ = g  # count is non-differentiable
    gda, gdb = _pooled_hinge_bwd_call(da, db, mu, mv, mvalid, pu, pv, pvalid,
                                      M, use_pix, M_pixel, interpret)
    zeros = (jnp.zeros_like(mu), jnp.zeros_like(mv), jnp.zeros_like(mvalid),
             jnp.zeros_like(pu), jnp.zeros_like(pv), jnp.zeros_like(pvalid))
    return (g_loss * gda, g_loss * gdb) + zeros


pooled_hinge.defvjp(_vjp_fwd, _vjp_bwd)


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"
