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
    # b == 0 rows are inactive padding -> y = 0 (cplx.magnitude_prox_rows)
    coeff = (b_ref[:] / d + mu) / (1.0 + mu) * (b_ref[:] > 0)
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
    # b == 0 rows are inactive padding -> y = 0 (cplx.magnitude_prox_rows)
    coeff = (b_ref[:] / d + mu) / (1.0 + mu) * (b_ref[:] > 0)
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


# ---------------------------------------------------------------------------
# Fused spectral-profile Z-prox (the 2ACE novelty, ref:
# inferLowRankV4_multi.m:423-485) as ONE Pallas kernel.
#
# The JAX implementation (cplx._panel_spectral_prox_c) runs ~15 separate XLA
# ops per ADMM iteration: panel Gram, warm perturbative eigenbasis update
# (rotate / first-order correction / Newton-Schulz), constraint-ladder
# rescale, and the low-rank delta applied back to the panel — each a tiny
# (nr x nr) or (nr x r*nt) op round-tripping HBM.  Here the whole chain runs
# VMEM-resident in a single kernel.
#
# Layout trick (why there is no transpose anywhere): the panel form
# E (nr, r*nt) of the transposed state z (r, nt*nr) is a TRANSPOSE of the
# free reshape W = z.reshape(r*nt, nr) (nr is z's fastest axis).  The chain
# is re-derived on W directly:
#     G_W = W^H W              ( = conj(E E^H): conjugate-consistent basis)
#     perturbative basis update on G_W with V0_W = conj(V0_E)
#     delta_W = V diag(sqrt(scale)-1) V^H
#     W_new = W + W delta_W    ( = reshape of E_new = E + delta_E E )
# Every contraction is a lax.dot_general with explicit dimension numbers
# (contract axis 0 for A^H B forms, axis 1 for A B^T forms), so Mosaic never
# needs a physical transpose; 16x16 transposes inside the correction step
# use the MXU identity trick  X^T = dot(X, I) contracting axis 0.
# ---------------------------------------------------------------------------


def _dg(x, y, ca: int, cb: int):
    """dot_general contracting x's axis ``ca`` with y's axis ``cb``."""
    return jax.lax.dot_general(x, y, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _zprox_kernel(w_re, w_im, v0_re, v0_im, wn_re, wn_im, vn_re, vn_im, *,
                  ladder, rel_gap: float, max_norm: float, ns_steps: int):
    """Fused Z-prox on W = z.reshape(r*nt, nr); V0 in W-convention."""
    nr = v0_re.shape[-1]
    wr, wi = w_re[:], w_im[:]
    vr, vi = v0_re[:], v0_im[:]
    eye = jnp.eye(nr, dtype=jnp.float32)

    def t16(x):
        # 16x16 transpose via MXU: (X^T)[p,q] = sum_k X[k,p] I[k,q]
        return _dg(x, eye, 0, 0)

    # ---- Gram G = W^H W (exactly Hermitian by construction)
    g_re = _dg(wr, wr, 0, 0) + _dg(wi, wi, 0, 0)
    g_im = _dg(wr, wi, 0, 0) - _dg(wi, wr, 0, 0)

    # ---- rotate: gr = V0^H (G V0)
    p_re = _dg(g_re, vr, 1, 0) - _dg(g_im, vi, 1, 0)
    p_im = _dg(g_re, vi, 1, 0) + _dg(g_im, vr, 1, 0)
    gr_re = _dg(vr, p_re, 0, 0) + _dg(vi, p_im, 0, 0)
    gr_im = _dg(vr, p_im, 0, 0) - _dg(vi, p_re, 0, 0)

    # ---- Rayleigh eigenvalue estimates (unsorted), row and column forms
    lam_row = jnp.sum(gr_re * eye, axis=0, keepdims=True)      # (1, nr) j
    lam_col = jnp.sum(gr_re * eye, axis=1, keepdims=True)      # (nr, 1) i

    # ---- first-order correction C_ij = gr_ij / (l_j - l_i), masked
    gap = lam_row - lam_col
    mag = jnp.abs(lam_row) + jnp.abs(lam_col)
    ok = jnp.abs(gap) > rel_gap * jnp.maximum(mag, 1e-30)
    denom = jnp.where(ok, gap, 1.0)
    c_re = jnp.where(ok, gr_re / denom, 0.0)
    c_im = jnp.where(ok, gr_im / denom, 0.0)
    # anti-Hermitian projection + Frobenius cap (Newton-Schulz basin)
    c_re = 0.5 * (c_re - t16(c_re))
    c_im = 0.5 * (c_im + t16(c_im))
    fro = jnp.sqrt(jnp.sum(c_re * c_re + c_im * c_im))
    capped = jnp.minimum(1.0, max_norm / jnp.maximum(fro, 1e-30))
    c_re = c_re * capped
    c_im = c_im * capped

    # ---- V = V0 (I + C)
    nvr = vr + (_dg(vr, c_re, 1, 0) - _dg(vi, c_im, 1, 0))
    nvi = vi + (_dg(vr, c_im, 1, 0) + _dg(vi, c_re, 1, 0))
    # ---- Newton-Schulz re-unitarization: V <- V (1.5 I - 0.5 V^H V)
    for _ in range(ns_steps):
        vtv_re = _dg(nvr, nvr, 0, 0) + _dg(nvi, nvi, 0, 0)
        vtv_im = _dg(nvr, nvi, 0, 0) - _dg(nvi, nvr, 0, 0)
        q_re = 1.5 * eye - 0.5 * vtv_re
        q_im = -0.5 * vtv_im
        tr = _dg(nvr, q_re, 1, 0) - _dg(nvi, q_im, 1, 0)
        ti = _dg(nvr, q_im, 1, 0) + _dg(nvi, q_re, 1, 0)
        nvr, nvi = tr, ti

    # ---- constraint-ladder scales on the unsorted spectrum
    # (ref: inferLowRankV4_multi.m:437-480; rank by pairwise comparison)
    w_row = jnp.maximum(lam_row, 0.0)                          # (1, nr)
    w_col = jnp.maximum(lam_col, 0.0)                          # (nr, 1)
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 1)   # col index i
    idx_j = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 0)   # row index j
    gt = w_col > w_row                  # [j, i]: w_j > w_i
    eq = w_col == w_row
    tie = jnp.logical_and(eq, idx_j < idx_i)
    rank = jnp.sum(jnp.logical_or(gt, tie).astype(jnp.float32),
                   axis=0, keepdims=True)                      # (1, nr)
    scale = jnp.ones_like(w_row)
    v_tot = jnp.sum(w_row)
    w_cur = w_row
    for rk, f in ladder:
        head = rank < float(rk)
        vr_sum = jnp.sum(jnp.where(head, w_cur, 0.0))
        need = vr_sum < v_tot * f
        s = jnp.minimum(1.0, vr_sum / jnp.maximum(v_tot - vr_sum, 1e-30)
                        * (1.0 / f - 1.0))
        s = jnp.where(need, s, 1.0)
        mult = jnp.where(head, 1.0, s)
        w_cur = w_cur * mult
        scale = scale * mult
        v_tot = jnp.sum(w_cur)

    # ---- delta = V diag(sqrt(scale)-1) V^H; W_new = W + W delta
    coeff = jnp.sqrt(scale) - 1.0                              # (1, nr)
    vc_re = nvr * coeff
    vc_im = nvi * coeff
    # delta = Vc V^H: contract lane axis of both (A B^H form)
    d_re = _dg(vc_re, nvr, 1, 1) + _dg(vc_im, nvi, 1, 1)
    d_im = _dg(vc_im, nvr, 1, 1) - _dg(vc_re, nvi, 1, 1)
    wn_re[:] = wr + (_dg(wr, d_re, 1, 0) - _dg(wi, d_im, 1, 0))
    wn_im[:] = wi + (_dg(wr, d_im, 1, 0) + _dg(wi, d_re, 1, 0))
    vn_re[:] = nvr
    vn_im[:] = nvi


@functools.partial(jax.jit, static_argnames=("nt", "nr", "ladder",
                                             "interpret"))
def fused_zprox_t(z_t: Pair, v0: Pair, nt: int, nr: int, ladder,
                  interpret: bool = False):
    """Fused warm spectral-profile Z-prox on transposed state z (r, nt*nr).

    ``v0``: unitary Pair eigenbasis in the E-convention of
    :func:`...cplx.panel_gram_basis_pair` / ``_panel_spectral_prox_c``
    (conjugated to W-convention at the kernel boundary, so callers can mix
    this kernel with the JAX path freely).  Returns ``(z_new, v_new)`` with
    identical semantics to ``cplx._panel_spectral_prox_c`` on a warm basis.
    ref: inferLowRankV4_multi.m:423-485.
    """
    r, n = z_t.shape[-2:]
    assert n == nt * nr
    k = r * nt
    w_re = z_t.re.reshape(z_t.re.shape[:-2] + (k, nr))
    w_im = z_t.im.reshape(z_t.im.shape[:-2] + (k, nr))

    kern = functools.partial(
        _zprox_kernel, ladder=tuple(ladder),
        rel_gap=1e-3, max_norm=0.7, ns_steps=1)
    full = lambda shape: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((k, nr), jnp.float32),
                 jax.ShapeDtypeStruct((k, nr), jnp.float32),
                 jax.ShapeDtypeStruct((nr, nr), jnp.float32),
                 jax.ShapeDtypeStruct((nr, nr), jnp.float32)]
    wn_re, wn_im, vn_re, vn_im = pl.pallas_call(
        kern,
        in_specs=[full(None)] * 4,
        out_specs=[full(None)] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(w_re, w_im, v0.re, -v0.im)      # E-convention -> W-convention (conj)
    z_new = Pair(wn_re.reshape(z_t.re.shape), wn_im.reshape(z_t.im.shape))
    return z_new, Pair(vn_re, -vn_im)  # W-convention -> E-convention


# ---------------------------------------------------------------------------
# BATCHED fused Z-prox: G instances lane-packed into one (128, 128) tile.
#
# At production batch sizes the per-instance chain above loses to XLA: each
# 16x16 op occupies 16/128 x 16/128 of an MXU pass (~1.5% utilization), and
# the grid serializes instances.  The batched kernel packs G = 128 // nr
# instances along the LANE axis and represents every per-instance (nr, nr)
# matrix as one (128, 128) BLOCK-DIAGONAL matrix.  Key algebraic fact:
# block-diagonal matrices are CLOSED under matmul — blockdiag(A_g) @
# blockdiag(B_g) = blockdiag(A_g B_g) — so after masking the initial Gram
# once, the entire perturbative-eigenbasis / Newton-Schulz / delta chain
# runs as dense 128x128 MXU ops computing all G instances at once (the off-
# diagonal blocks stay exactly zero: zero rows times anything is zero).
# The two panel-sized contractions (Gram and delta-apply) become
# (k, 128) x (128, 128) matmuls — 8x more FLOPs than the G separate
# (k, nr) forms but ~8x fewer MXU passes, a strict win at nr = 16.
# Per-instance reductions (Frobenius cap, ladder variance sums, eigenvalue
# ranks) are confined to blocks by a 0/1 same-block mask, applied via one
# (1, 128) @ (128, 128) matmul per reduction.
# ---------------------------------------------------------------------------


def _zprox_batch_kernel(w_re, w_im, v0_re, v0_im,
                        wn_re, wn_im, vn_re, vn_im, *,
                        nr: int, ladder, rel_gap: float, max_norm: float,
                        ns_steps: int):
    """Fused Z-prox on G lane-packed instances; all (L, L) ops block-diag.

    ``w_*``: (1, k, L) packed panels W_g side by side (L = G * nr);
    ``v0_*``: (1, L, L) block-diagonal warm basis (W-convention).
    """
    l_dim = v0_re.shape[-1]
    wr, wi = w_re[0], w_im[0]
    vr, vi = v0_re[0], v0_im[0]
    eye = jnp.eye(l_dim, dtype=jnp.float32)
    # same-block mask: block(i) == block(j)
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 0) // nr
    idx_j = jax.lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 1) // nr
    bmask = (idx_i == idx_j).astype(jnp.float32)

    def t_l(x):
        return _dg(x, eye, 0, 0)

    def block_sum(v_row):
        """Per-block totals of a (1, L) row, broadcast back to (1, L)."""
        return _dg(v_row, bmask, 1, 0)

    # ---- packed Gram, masked to block-diagonal once
    g_re = (_dg(wr, wr, 0, 0) + _dg(wi, wi, 0, 0)) * bmask
    g_im = (_dg(wr, wi, 0, 0) - _dg(wi, wr, 0, 0)) * bmask

    # ---- rotate: gr = V0^H (G V0)   (block-diag in, block-diag out)
    p_re = _dg(g_re, vr, 1, 0) - _dg(g_im, vi, 1, 0)
    p_im = _dg(g_re, vi, 1, 0) + _dg(g_im, vr, 1, 0)
    gr_re = _dg(vr, p_re, 0, 0) + _dg(vi, p_im, 0, 0)
    gr_im = _dg(vr, p_im, 0, 0) - _dg(vi, p_re, 0, 0)

    lam_row = jnp.sum(gr_re * eye, axis=0, keepdims=True)      # (1, L)
    lam_col = jnp.sum(gr_re * eye, axis=1, keepdims=True)      # (L, 1)

    # ---- first-order correction (cross-block entries have gr == 0 -> 0)
    gap = lam_row - lam_col
    mag = jnp.abs(lam_row) + jnp.abs(lam_col)
    ok = jnp.abs(gap) > rel_gap * jnp.maximum(mag, 1e-30)
    denom = jnp.where(ok, gap, 1.0)
    c_re = jnp.where(ok, gr_re / denom, 0.0) * bmask
    c_im = jnp.where(ok, gr_im / denom, 0.0) * bmask
    c_re = 0.5 * (c_re - t_l(c_re))
    c_im = 0.5 * (c_im + t_l(c_im))
    # per-block Frobenius cap: row sums -> transpose -> block totals
    row2 = jnp.sum(c_re * c_re + c_im * c_im, axis=1, keepdims=True)  # (L,1)
    fro2 = block_sum(t_l(row2))                                       # (1,L)
    fro = jnp.sqrt(jnp.maximum(fro2, 0.0))
    capped = jnp.minimum(1.0, max_norm / jnp.maximum(fro, 1e-30))
    c_re = c_re * capped            # per-block column scale == block scale
    c_im = c_im * capped

    # ---- V = V0 (I + C), then Newton-Schulz re-unitarization
    nvr = vr + (_dg(vr, c_re, 1, 0) - _dg(vi, c_im, 1, 0))
    nvi = vi + (_dg(vr, c_im, 1, 0) + _dg(vi, c_re, 1, 0))
    for _ in range(ns_steps):
        vtv_re = _dg(nvr, nvr, 0, 0) + _dg(nvi, nvi, 0, 0)
        vtv_im = _dg(nvr, nvi, 0, 0) - _dg(nvi, nvr, 0, 0)
        q_re = 1.5 * eye - 0.5 * vtv_re
        q_im = -0.5 * vtv_im
        tr = _dg(nvr, q_re, 1, 0) - _dg(nvi, q_im, 1, 0)
        ti = _dg(nvr, q_im, 1, 0) + _dg(nvi, q_re, 1, 0)
        nvr, nvi = tr, ti

    # ---- constraint ladder, rank/variance confined to blocks
    w_row = jnp.maximum(lam_row, 0.0)                          # (1, L)
    w_col = jnp.maximum(lam_col, 0.0)                          # (L, 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 1)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (l_dim, l_dim), 0)
    gt = jnp.logical_and(w_col > w_row, bmask > 0)
    eq = jnp.logical_and(w_col == w_row, bmask > 0)
    tie = jnp.logical_and(eq, lane_j < lane_i)
    rank = jnp.sum(jnp.logical_or(gt, tie).astype(jnp.float32),
                   axis=0, keepdims=True)                      # (1, L)
    scale = jnp.ones_like(w_row)
    v_tot = block_sum(w_row)                                   # (1, L)
    w_cur = w_row
    for rk, f in ladder:
        head = rank < float(rk)
        vr_sum = block_sum(jnp.where(head, w_cur, 0.0))        # (1, L)
        need = vr_sum < v_tot * f
        s = jnp.minimum(1.0, vr_sum / jnp.maximum(v_tot - vr_sum, 1e-30)
                        * (1.0 / f - 1.0))
        s = jnp.where(need, s, 1.0)
        mult = jnp.where(head, 1.0, s)
        w_cur = w_cur * mult
        scale = scale * mult
        v_tot = block_sum(w_cur)

    # ---- delta = V diag(sqrt(scale)-1) V^H; W_new = W + W delta
    coeff = jnp.sqrt(scale) - 1.0
    vc_re = nvr * coeff
    vc_im = nvi * coeff
    d_re = _dg(vc_re, nvr, 1, 1) + _dg(vc_im, nvi, 1, 1)
    d_im = _dg(vc_im, nvr, 1, 1) - _dg(vc_re, nvi, 1, 1)
    wn_re[0] = wr + (_dg(wr, d_re, 1, 0) - _dg(wi, d_im, 1, 0))
    wn_im[0] = wi + (_dg(wr, d_im, 1, 0) + _dg(wi, d_re, 1, 0))
    vn_re[0] = nvr
    vn_im[0] = nvi


def zprox_batch_group(nr: int, lanes: int = 128) -> int:
    """Instances packed per (lanes, lanes) tile."""
    return max(1, lanes // nr)


def pack_basis_w(v0_e: Pair, nr: int, lanes: int = 128) -> Pair:
    """Pack per-instance E-convention bases (B, nr, nr) into block-diagonal
    W-convention tiles (B/G, L, L) for :func:`fused_zprox_batch`.

    W-convention = conj of the E-convention basis (see fused_zprox_t)."""
    g = zprox_batch_group(nr, lanes)
    b = v0_e.re.shape[0]
    assert b % g == 0, (b, g)
    ng, l_dim = b // g, g * nr
    eye_g = jnp.eye(g, dtype=jnp.float32)
    pr = v0_e.re.reshape(ng, g, nr, nr)
    pi = -v0_e.im.reshape(ng, g, nr, nr)     # conj: E -> W convention
    pack_r = jnp.einsum("ngij,gh->ngihj", pr, eye_g).reshape(ng, l_dim, l_dim)
    pack_i = jnp.einsum("ngij,gh->ngihj", pi, eye_g).reshape(ng, l_dim, l_dim)
    return Pair(pack_r, pack_i)


@functools.partial(jax.jit, static_argnames=("nt", "nr", "ladder",
                                             "interpret"))
def fused_zprox_batch(z_t: Pair, v0_packed: Pair, nt: int, nr: int, ladder,
                      interpret: bool = False):
    """Batched fused spectral-profile Z-prox (ref:
    inferLowRankV4_multi.m:423-485) on transposed state ``z_t`` (B, r, n).

    ``v0_packed``: (B/G, L, L) block-diagonal warm basis from
    :func:`pack_basis_w` (or a previous call's ``v_new``); it stays packed
    across iterations — only the panel state is re-laid-out per call, and
    XLA fuses that relayout into the surrounding elementwise ops.
    Returns ``(z_new (B, r, n), v_new_packed)``.
    """
    b, r, n = z_t.re.shape
    assert n == nt * nr
    g = zprox_batch_group(nr)
    assert b % g == 0, (b, g)
    ng, l_dim, k = b // g, g * nr, r * nt

    def pack(x):
        w = x.reshape(ng, g, k, nr)
        return w.transpose(0, 2, 1, 3).reshape(ng, k, l_dim)

    def unpack(w):
        x = w.reshape(ng, k, g, nr).transpose(0, 2, 1, 3)
        return x.reshape(b, r, n)

    kern = functools.partial(
        _zprox_batch_kernel, nr=nr, ladder=tuple(ladder),
        rel_gap=1e-3, max_norm=0.7, ns_steps=1)
    wspec = pl.BlockSpec((1, k, l_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, l_dim, l_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((ng, k, l_dim), jnp.float32),
                 jax.ShapeDtypeStruct((ng, k, l_dim), jnp.float32),
                 jax.ShapeDtypeStruct((ng, l_dim, l_dim), jnp.float32),
                 jax.ShapeDtypeStruct((ng, l_dim, l_dim), jnp.float32)]
    wn_re, wn_im, vn_re, vn_im = pl.pallas_call(
        kern,
        grid=(ng,),
        in_specs=[wspec, wspec, vspec, vspec],
        out_specs=[wspec, wspec, vspec, vspec],
        out_shape=out_shape,
        interpret=interpret,
    )(pack(z_t.re), pack(z_t.im), v0_packed.re, v0_packed.im)
    return (Pair(unpack(wn_re), unpack(wn_im)), Pair(vn_re, vn_im))
