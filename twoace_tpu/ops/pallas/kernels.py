"""Pallas TPU kernels for the 2ACE ADMM hot loop.

Two kernels cover the memory-bound part of the iteration
(ref loop: inferLowRankV4_multi.m:318-341):

  - :func:`fused_prox_dual`: the Y magnitude prox and the M dual update
    fused into one VMEM pass.  XLA keeps them as separate HBM-roundtripping
    ops because the prox's row reduction breaks its fusion; fusing saves
    two full reads + one write of the (m, r) pair state per iteration.
  - :func:`pair_matmul`: tiled 3-multiplication (Karatsuba) complex matmul
    on (re, im) pairs — the X-update / AX matmuls — keeping both planes of
    a tile resident in VMEM so the MXU sees back-to-back real matmuls.

Both have reference implementations in :mod:`..cplx` and are validated
against them (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Pair


def _prox_dual_kernel(b_ref, ax_re, ax_im, md_re, md_im, mu_ref,
                      y_re, y_im, mo_re, mo_im):
    """One row-block: y = prox(ax + md/mu), m_out = md + mu (ax - y)."""
    mu = mu_ref[0, 0]
    inv_mu = 1.0 / mu
    yr = ax_re[:] + md_re[:] * inv_mu
    yi = ax_im[:] + md_im[:] * inv_mu
    d2 = jnp.sum(yr * yr + yi * yi, axis=1, keepdims=True)
    # zero rows: Y(I,:) = 1/sqrt(r), D(I) = 1 (ref :516-519)
    zero = d2 <= 0
    r = yr.shape[1]
    yr = jnp.where(zero, 1.0 / (r ** 0.5), yr)
    yi = jnp.where(zero, 0.0, yi)
    d = jnp.sqrt(jnp.where(zero, 1.0, d2))
    coeff = (b_ref[:] / d + mu) / (1.0 + mu)
    out_r = yr * coeff
    out_i = yi * coeff
    y_re[:] = out_r
    y_im[:] = out_i
    mo_re[:] = md_re[:] + mu * (ax_re[:] - out_r)
    mo_im[:] = md_im[:] + mu * (ax_im[:] - out_i)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_prox_dual(ax: Pair, b, m_dual: Pair, mu,
                    block_rows: int = 256, interpret: bool = False):
    """Fused ArgMinY + M-dual update (scale_by_row semantics).

    ``ax``, ``m_dual``: (m, r) pairs; ``b``: (m,); ``mu``: scalar.
    Returns ``(y, m_new)`` pairs.  ref: inferLowRankV4_multi.m:511-523 and
    :336-337.
    """
    m, r = ax.re.shape
    block_rows = min(block_rows, m)
    grid = (pl.cdiv(m, block_rows),)
    b2 = b.reshape(m, 1)
    mu_arr = jnp.asarray(mu, jnp.float32).reshape(1, 1)

    def row_spec():
        return pl.BlockSpec((block_rows, r), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((m, r), jnp.float32)] * 4
    y_re, y_im, mo_re, mo_im = pl.pallas_call(
        _prox_dual_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec(), row_spec(), row_spec(), row_spec(),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[row_spec()] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(b2, ax.re, ax.im, m_dual.re, m_dual.im, mu_arr)
    return Pair(y_re, y_im), Pair(mo_re, mo_im)


def _prox_dual_t_kernel(b_ref, ax_re, ax_im, md_re, md_im, mu_ref,
                        y_re, y_im, mo_re, mo_im):
    """Transposed-layout block: arrays are (r, m_block); b is (1, m_block).

    The per-measurement-row norm reduces over the leading (sublane) r axis,
    so the lane dimension stays the long m axis — matching the production
    transposed state layout of :func:`...cplx.admm_iteration_pair_t`.
    """
    mu = mu_ref[0, 0]
    inv_mu = 1.0 / mu
    yr = ax_re[:] + md_re[:] * inv_mu
    yi = ax_im[:] + md_im[:] * inv_mu
    d2 = jnp.sum(yr * yr + yi * yi, axis=0, keepdims=True)
    # zero rows: Y(I,:) = 1/sqrt(r), D(I) = 1 (ref :516-519)
    zero = d2 <= 0
    r = yr.shape[0]
    yr = jnp.where(zero, 1.0 / (r ** 0.5), yr)
    yi = jnp.where(zero, 0.0, yi)
    d = jnp.sqrt(jnp.where(zero, 1.0, d2))
    coeff = (b_ref[:] / d + mu) / (1.0 + mu)
    out_r = yr * coeff
    out_i = yi * coeff
    y_re[:] = out_r
    y_im[:] = out_i
    mo_re[:] = md_re[:] + mu * (ax_re[:] - out_r)
    mo_im[:] = md_im[:] + mu * (ax_im[:] - out_i)


@functools.partial(jax.jit, static_argnames=("block_cols", "interpret"))
def fused_prox_dual_t(ax_t: Pair, b, m_dual_t: Pair, mu,
                      block_cols: int = 512, interpret: bool = False):
    """Fused ArgMinY + M-dual update on TRANSPOSED (r, m) state.

    Drop-in fusion of :func:`...cplx.magnitude_prox_cols` plus the M dual
    update (ref: inferLowRankV4_multi.m:511-523 and :336-337): one VMEM pass
    instead of XLA's separate HBM-roundtripping prox and dual kernels.
    Returns ``(y_t, m_new_t)`` pairs.
    """
    r, m = ax_t.re.shape
    block_cols = min(block_cols, m)
    grid = (pl.cdiv(m, block_cols),)
    b2 = b.reshape(1, m)
    mu_arr = jnp.asarray(mu, jnp.float32).reshape(1, 1)

    def col_spec(rows):
        return pl.BlockSpec((rows, block_cols), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((r, m), jnp.float32)] * 4
    y_re, y_im, mo_re, mo_im = pl.pallas_call(
        _prox_dual_t_kernel,
        grid=grid,
        in_specs=[
            col_spec(1),
            col_spec(r), col_spec(r), col_spec(r), col_spec(r),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[col_spec(r)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(b2, ax_t.re, ax_t.im, m_dual_t.re, m_dual_t.im, mu_arr)
    return Pair(y_re, y_im), Pair(mo_re, mo_im)


def _pair_matmul_kernel(ar_ref, ai_ref, br_ref, bi_ref, or_ref, oi_ref,
                        acc_r, acc_i, *, n_k: int):
    """One (TM, TN) output tile; loop over K blocks accumulates in VMEM."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    ar, ai = ar_ref[:], ai_ref[:]
    br, bi = br_ref[:], bi_ref[:]
    k1 = jnp.dot(ar, br + bi, preferred_element_type=jnp.float32)
    k2 = jnp.dot(ar + ai, bi, preferred_element_type=jnp.float32)
    k3 = jnp.dot(ai - ar, br, preferred_element_type=jnp.float32)
    acc_r[:] += k1 - k2
    acc_i[:] += k1 + k3

    @pl.when(k == n_k - 1)
    def _():
        or_ref[:] = acc_r[:]
        oi_ref[:] = acc_i[:]


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "interpret"))
def pair_matmul(a: Pair, b: Pair, tm: int = 128, tn: int = 128,
                tk: int = 128, interpret: bool = False) -> Pair:
    """Tiled pair-complex matmul A @ B via 3 real MXU matmuls per tile."""
    m, k = a.re.shape
    k2, n = b.re.shape
    assert k == k2
    tm, tn, tk = min(tm, m), min(tn, n), min(tk, k)
    n_k = pl.cdiv(k, tk)
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn), n_k)

    a_spec = pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                          memory_space=pltpu.VMEM)

    out_r, out_i = pl.pallas_call(
        functools.partial(_pair_matmul_kernel, n_k=n_k),
        grid=grid,
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=[o_spec, o_spec],
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=interpret,
    )(a.re, a.im, b.re, b.im)
    return Pair(out_r, out_i)
