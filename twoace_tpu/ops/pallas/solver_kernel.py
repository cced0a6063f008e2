"""The ENTIRE InferADMM inner solve as one Pallas TPU kernel.

:func:`fused_infer_admm` runs the full 2ACE ADMM loop — X-update against
the precomputed U, magnitude prox, spectral-profile Z-prox with the warm
perturbative eigenbasis, dual updates, best-so-far tracking, the three
residual convergence tests and conditional mu adaptation (ref:
inferLowRankV4_multi.m:281-386) — for all ``maxiter`` iterations inside a
single kernel.  Every state array lives in VMEM for the whole solve
(~2.5 MB at the production 16x16 shape), so per-iteration XLA kernel
launches and HBM round-trips disappear entirely.  This is the
speed-of-light design for the latency-bound single-recovery path (the
mobility-tracking setting, ref: RSS_Mobility.m:155-188).

Semantics notes:
  - the JAX path uses lax.while_loop with a convergence exit; here a
    fori_loop runs the static ``maxiter`` trip count with all updates
    select-frozen once converged — identical results, and measured
    workloads hit maxiter anyway (wasted trips only on early exits);
  - the panel Gram and the delta-apply of the Z-prox work per nr-wide
    LANE SLICE of the (r, nt*nr) state (z[:, t*nr:(t+1)*nr]), summing /
    applying across the nt slices — mathematically identical to the
    (nr, r*nt) panel form but with zero cross-lane reshapes, which Mosaic
    cannot lower cheaply;
  - every contraction is a lax.dot_general with explicit dimension
    numbers (A^H B contracts axis 0, A B^T contracts axis 1), so no
    physical transpose is ever materialized.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import Pair


def _dg(x, y, ca: int, cb: int, prec=None):
    return jax.lax.dot_general(x, y, (((ca,), (cb,)), ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)


def _pm(ar, ai, br, bi, prec=None):
    """Standard complex matmul (contract last of A with first of B),
    Karatsuba 3M form."""
    k1 = _dg(ar, br + bi, 1, 0, prec)
    k2 = _dg(ar + ai, bi, 1, 0, prec)
    k3 = _dg(ai - ar, br, 1, 0, prec)
    return k1 - k2, k1 + k3


def _pm_bt(ar, ai, br, bi, prec=None):
    """A @ B^T (contract axis 1 of both)."""
    k1 = _dg(ar, br + bi, 1, 1, prec)
    k2 = _dg(ar + ai, bi, 1, 1, prec)
    k3 = _dg(ai - ar, br, 1, 1, prec)
    return k1 - k2, k1 + k3


# ---------------------------------------------------------------------------
# 3-pass compensated ("split3") matmul: decompose each float32 operand into
# a bf16 hi/lo pair (x = hi + lo + O(2^-16 |x|)) and take three single-pass
# bf16 MXU products hi*hi + hi*lo + lo*hi, accumulating in f32.  Relative
# error ~2^-16 per product — deep enough for the solver's tol_rel=1e-4
# residual tests — at HALF the MXU passes of the XLA float32 emulation
# (6-pass), which is the whole point: the XLA production path pays 6 passes
# per real dot, this kernel pays 3 (VERDICT r04 #6).
# ---------------------------------------------------------------------------

def _split(v):
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _dg3(xs, ys, ca: int, cb: int):
    """dot_general over pre-split operands ``xs = (hi, lo)``.  bf16 inputs
    are single-pass on the MXU at any precision; DEFAULT is pinned
    explicitly so no ambient jax.default_matmul_precision can leak in."""
    xh, xl = xs
    yh, yl = ys
    d = jax.lax.Precision.DEFAULT
    return (_dg(xh, yh, ca, cb, d) + _dg(xh, yl, ca, cb, d)
            + _dg(xl, yh, ca, cb, d))


def _pm3(xr, xi, bs, contract_b: int):
    """Karatsuba complex matmul against a PRE-SPLIT constant operand
    ``bs = (br, bi, br+bi)`` each as a (hi, lo) pair; the dynamic (xr, xi)
    side is split on the fly (cheap VPU work vs 3 MXU passes saved).
    ``contract_b``: 0 for A@B, 1 for A@B^T."""
    br_s, bi_s, bsum_s = bs
    xr_s = _split(xr)
    xi_s = _split(xi)
    xsum_s = _split(xr + xi)
    xdif_s = _split(xi - xr)
    k1 = _dg3(xr_s, bsum_s, 1, contract_b)
    k2 = _dg3(xsum_s, bi_s, 1, contract_b)
    k3 = _dg3(xdif_s, br_s, 1, contract_b)
    return k1 - k2, k1 + k3


def _presplit3(br, bi):
    """(br, bi, br+bi) hi/lo pairs for :func:`_pm3`."""
    return (_split(br), _split(bi), _split(br + bi))


def _fro2(xr, xi):
    return jnp.sum(xr * xr + xi * xi)


def _perturb_ladder(g_re, g_im, vr, vi, ladder,
                    rel_gap: float = 1e-3, max_norm: float = 0.7,
                    ns_steps: int = 1, prec=None):
    """Warm perturbative eigenbasis update + constraint-ladder scales.

    Pure-value core shared with :func:`.kernels._zprox_kernel` semantics
    (W-convention basis).  Returns ``(coeff (1, nr), nvr, nvi)`` with
    coeff = sqrt(ladder scale) - 1 aligned with the new basis columns.
    """
    nr = g_re.shape[-1]
    eye = jnp.eye(nr, dtype=jnp.float32)

    def t16(x):
        return _dg(x, eye, 0, 0, prec)

    p_re = _dg(g_re, vr, 1, 0, prec) - _dg(g_im, vi, 1, 0, prec)
    p_im = _dg(g_re, vi, 1, 0, prec) + _dg(g_im, vr, 1, 0, prec)
    gr_re = _dg(vr, p_re, 0, 0, prec) + _dg(vi, p_im, 0, 0, prec)
    gr_im = _dg(vr, p_im, 0, 0, prec) - _dg(vi, p_re, 0, 0, prec)

    lam_row = jnp.sum(gr_re * eye, axis=0, keepdims=True)
    lam_col = jnp.sum(gr_re * eye, axis=1, keepdims=True)

    gap = lam_row - lam_col
    mag = jnp.abs(lam_row) + jnp.abs(lam_col)
    ok = jnp.abs(gap) > rel_gap * jnp.maximum(mag, 1e-30)
    denom = jnp.where(ok, gap, 1.0)
    c_re = jnp.where(ok, gr_re / denom, 0.0)
    c_im = jnp.where(ok, gr_im / denom, 0.0)
    c_re = 0.5 * (c_re - t16(c_re))
    c_im = 0.5 * (c_im + t16(c_im))
    fro = jnp.sqrt(jnp.sum(c_re * c_re + c_im * c_im))
    capped = jnp.minimum(1.0, max_norm / jnp.maximum(fro, 1e-30))
    c_re = c_re * capped
    c_im = c_im * capped

    nvr = vr + (_dg(vr, c_re, 1, 0, prec) - _dg(vi, c_im, 1, 0, prec))
    nvi = vi + (_dg(vr, c_im, 1, 0, prec) + _dg(vi, c_re, 1, 0, prec))
    for _ in range(ns_steps):
        vtv_re = _dg(nvr, nvr, 0, 0, prec) + _dg(nvi, nvi, 0, 0, prec)
        vtv_im = _dg(nvr, nvi, 0, 0, prec) - _dg(nvi, nvr, 0, 0, prec)
        q_re = 1.5 * eye - 0.5 * vtv_re
        q_im = -0.5 * vtv_im
        tr = _dg(nvr, q_re, 1, 0, prec) - _dg(nvi, q_im, 1, 0, prec)
        ti = _dg(nvr, q_im, 1, 0, prec) + _dg(nvi, q_re, 1, 0, prec)
        nvr, nvi = tr, ti

    w_row = jnp.maximum(lam_row, 0.0)
    w_col = jnp.maximum(lam_col, 0.0)
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 1)
    idx_j = jax.lax.broadcasted_iota(jnp.int32, (nr, nr), 0)
    gt = w_col > w_row
    eq = w_col == w_row
    tie = jnp.logical_and(eq, idx_j < idx_i)
    rank = jnp.sum(jnp.logical_or(gt, tie).astype(jnp.float32),
                   axis=0, keepdims=True)
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

    coeff = jnp.sqrt(scale) - 1.0
    return coeff, nvr, nvi


def _solve_kernel(ar_ref, ai_ref, b_ref, ur_ref, ui_ref,
                  y0r_ref, y0i_ref, z0r_ref, z0i_ref, v0r_ref, v0i_ref,
                  mu0_ref,
                  oxr_ref, oxi_ref, oyr_ref, oyi_ref, stat_ref, *,
                  nt: int, nr: int, ladder, scale_by_row: bool,
                  rho: float, tol_rel: float, tol_abs: float, maxiter: int,
                  precision: str = "default"):
    ar, ai = ar_ref[:], ai_ref[:]                    # (m, n)
    b2 = b_ref[:]                                    # (1, m)
    ur, ui = ur_ref[:], ui_ref[:]                    # (n, n)
    m, n = ar.shape
    r = y0r_ref.shape[0]
    inv_r_sqrt = 1.0 / math.sqrt(r)

    # precision mode (VERDICT r04 #6):
    #   default — single-pass bf16 MXU everywhere (fastest, -46 dB floor)
    #   highest — Mosaic's native 6-pass f32 emulation on every dot
    #   split3  — 3-pass compensated matmuls against pre-split constants
    #             for the big A/U dots (HALF the XLA f32 path's passes),
    #             native 6-pass on the tiny eigenbasis dots
    if precision == "default":
        prec_small = None
    else:
        prec_small = jax.lax.Precision.HIGHEST
    if precision == "split3":
        neg = lambda s: (-s[0], -s[1])                       # noqa: E731
        ar_s, ai_s = _split(ar), _split(ai)
        bs_amul = (ar_s, ai_s, _split(ar + ai))              # X @ A^T
        bs_ahmul = (ar_s, neg(ai_s), _split(ar - ai))        # X @ conj(A)
        bs_u = (_split(ur), neg(_split(ui)), _split(ur - ui))  # rhs @ conj(U)

        def ah_mul(xr, xi):                          # (r,m)->(r,n)
            return _pm3(xr, xi, bs_ahmul, 0)

        def a_mul(xr, xi):                           # (r,n)->(r,m)
            return _pm3(xr, xi, bs_amul, 1)

        def u_mul(xr, xi):                           # (r,n)->(r,n)
            return _pm3(xr, xi, bs_u, 0)
    else:
        def ah_mul(xr, xi):                          # X @ conj(A)
            return _pm(xr, xi, ar, -ai, prec_small)

        def a_mul(xr, xi):                           # X @ A^T
            return _pm_bt(xr, xi, ar, ai, prec_small)

        def u_mul(xr, xi):
            return _pm(xr, xi, ur, -ui, prec_small)

    def zprox(zr, zi, vr, vi):
        """Spectral-profile prox on (r, nt*nr) state via nr-wide lane
        slices; basis in W-convention.  Returns (z_new, v_new)."""
        g_re = jnp.zeros((nr, nr), jnp.float32)
        g_im = jnp.zeros((nr, nr), jnp.float32)
        for t in range(nt):
            sr = zr[:, t * nr:(t + 1) * nr]
            si = zi[:, t * nr:(t + 1) * nr]
            g_re = g_re + _dg(sr, sr, 0, 0, prec_small) \
                + _dg(si, si, 0, 0, prec_small)
            g_im = g_im + _dg(sr, si, 0, 0, prec_small) \
                - _dg(si, sr, 0, 0, prec_small)
        coeff, nvr, nvi = _perturb_ladder(g_re, g_im, vr, vi, ladder,
                                          prec=prec_small)
        # delta = (V * coeff) V^H
        vc_re = nvr * coeff
        vc_im = nvi * coeff
        d_re = _dg(vc_re, nvr, 1, 1, prec_small) \
            + _dg(vc_im, nvi, 1, 1, prec_small)
        d_im = _dg(vc_im, nvr, 1, 1, prec_small) \
            - _dg(vc_re, nvi, 1, 1, prec_small)
        outs_r, outs_i = [], []
        for t in range(nt):
            sr = zr[:, t * nr:(t + 1) * nr]
            si = zi[:, t * nr:(t + 1) * nr]
            pr, pi = _pm(sr, si, d_re, d_im, prec_small)
            outs_r.append(sr + pr)
            outs_i.append(si + pi)
        return (jnp.concatenate(outs_r, axis=1),
                jnp.concatenate(outs_i, axis=1), nvr, nvi)

    # ---- initial carry (ref :300-321 happens outside; this kernel takes
    # the prepared y0/z0/v0 and runs the loop, ref :281-386)
    y0r, y0i = y0r_ref[:], y0i_ref[:]
    z0r, z0i = z0r_ref[:], z0i_ref[:]
    atyr, atyi = ah_mul(y0r, y0i)
    zeros_m = jnp.zeros((r, m), jnp.float32)
    zeros_n = jnp.zeros((r, n), jnp.float32)
    if scale_by_row:
        ox0r, ox0i = zeros_n, zeros_n
        oy0r, oy0i = zeros_m, zeros_m
    else:
        ox0r = jnp.zeros((1, n), jnp.float32)
        ox0i = jnp.zeros((1, n), jnp.float32)
        oy0r = jnp.zeros((1, m), jnp.float32)
        oy0i = jnp.zeros((1, m), jnp.float32)
    inf = jnp.float32(jnp.inf)
    carry = (y0r, y0i, z0r, z0i, zeros_m, zeros_m, zeros_n, zeros_n,
             atyr, atyi, v0r_ref[:], v0i_ref[:],
             mu0_ref[0, 0], inf, inf,
             ox0r, ox0i, oy0r, oy0i,
             jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))

    def body(_, c):
        (yr, yi, zr, zi, mdr, mdi, ndr, ndi, atyr0, atyi0, vr, vi,
         mu, last_res, opt_obj, oxr, oxi, oyr, oyi, it, done, conv) = c
        inv_mu = 1.0 / mu

        # X-update (ref :401-409)
        tr_ = yr - mdr * inv_mu
        ti_ = yi - mdi * inv_mu
        r1r, r1i = ah_mul(tr_, ti_)
        rhs_r = r1r + (zr - ndr * inv_mu)
        rhs_i = r1i + (zi - ndi * inv_mu)
        xr, xi = u_mul(rhs_r, rhs_i)                 # rhs @ conj(U)
        axr, axi = a_mul(xr, xi)

        # Y-update (ref :511-533)
        pyr = axr + mdr * inv_mu
        pyi = axi + mdi * inv_mu
        if scale_by_row:
            d2 = jnp.sum(pyr * pyr + pyi * pyi, axis=0, keepdims=True)
            zero = d2 <= 0
            pyr = jnp.where(zero, inv_r_sqrt, pyr)
            pyi = jnp.where(zero, 0.0, pyi)
            dmag = jnp.sqrt(jnp.where(zero, 1.0, d2))
        else:
            d2 = pyr * pyr + pyi * pyi
            zero = d2 <= 0
            pyr = jnp.where(zero, 1.0, pyr)
            dmag = jnp.sqrt(jnp.where(zero, 1.0, d2))
        # rows with b == 0 are INACTIVE (static-shape window padding):
        # their exact prox is y = 0 (see cplx.magnitude_prox_rows)
        cf = (b2 / dmag + mu) / (1.0 + mu) * (b2 > 0)
        ynr = pyr * cf
        yni = pyi * cf
        atynr, atyni = ah_mul(ynr, yni)

        # Z-update (ref :423-485)
        zinr = xr + ndr * inv_mu
        zini = xi + ndi * inv_mu
        znr, zni, nvr, nvi = zprox(zinr, zini, vr, vi)

        # duals (ref :336-341)
        jmr = axr - ynr
        jmi = axi - yni
        mndr = mdr + mu * jmr
        mndi = mdi + mu * jmi
        jnr_ = xr - znr
        jni_ = xi - zni
        nndr = ndr + mu * jnr_
        nndi = ndi + mu * jni_

        # best-so-far (ref :343-361)
        if scale_by_row:
            amp = jnp.sqrt(jnp.maximum(
                jnp.sum(axr * axr + axi * axi, axis=0, keepdims=True), 0.0))
            obj = jnp.sqrt(jnp.sum((amp - b2) ** 2))
            better = obj < opt_obj
            noxr = jnp.where(better, xr, oxr)
            noxi = jnp.where(better, xi, oxi)
            noyr = jnp.where(better, ynr, oyr)
            noyi = jnp.where(better, yni, oyi)
            nopt = jnp.minimum(obj, opt_obj)
        else:
            amp = jnp.sqrt(jnp.maximum(axr * axr + axi * axi, 0.0))
            objs = jnp.sqrt(jnp.sum((amp - b2) ** 2, axis=1,
                                    keepdims=True))               # (r, 1)
            omin = jnp.min(objs)
            iot = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            jj = jnp.min(jnp.where(objs == omin, iot, r))
            sel = iot == jj                                       # (r, 1)
            obj = omin
            better = obj < opt_obj
            pick = jnp.logical_and(sel, better)
            noxr = jnp.where(better,
                             jnp.sum(jnp.where(pick, xr, 0.0), axis=0,
                                     keepdims=True), oxr)
            noxi = jnp.where(better,
                             jnp.sum(jnp.where(pick, xi, 0.0), axis=0,
                                     keepdims=True), oxi)
            noyr = jnp.where(better,
                             jnp.sum(jnp.where(pick, ynr, 0.0), axis=0,
                                     keepdims=True), oyr)
            noyi = jnp.where(better,
                             jnp.sum(jnp.where(pick, yni, 0.0), axis=0,
                                     keepdims=True), oyi)
            nopt = jnp.minimum(obj, opt_obj)

        # convergence (ref :363-375)
        nax = jnp.sqrt(_fro2(axr, axi))
        ny = jnp.sqrt(_fro2(ynr, yni))
        naty = jnp.sqrt(_fro2(atynr, atyni))
        nx = jnp.sqrt(_fro2(xr, xi))
        nz = jnp.sqrt(_fro2(znr, zni))
        res_prim = jnp.sqrt(_fro2(jmr, jmi) + _fro2(jnr_, jni_))
        res_dual = mu * jnp.sqrt(_fro2(atynr - atyr0, atyni - atyi0)
                                 + _fro2(znr - zr, zni - zi))
        res_comb = jnp.sqrt(res_prim ** 2 + _fro2(ynr - yr, yni - yi)
                            + _fro2(znr - zr, zni - zi))
        t_prim = (tol_abs * math.sqrt((m + n) * r)
                  + tol_rel * jnp.sqrt(jnp.maximum(nax, ny) ** 2
                                       + jnp.maximum(nx, nz) ** 2))
        t_dual = (tol_abs * math.sqrt(n * r * 2)
                  + tol_rel * jnp.sqrt(naty ** 2 + nz ** 2))
        t_comb = (tol_abs * math.sqrt((m + n) * r * 2)
                  + tol_rel * jnp.sqrt(jnp.maximum(nax, ny) ** 2
                                       + jnp.maximum(nx, nz) ** 2
                                       + ny ** 2 + nz ** 2))
        converged = jnp.logical_or(
            jnp.logical_and(res_prim < t_prim, res_dual < t_dual),
            res_comb < t_comb)
        nmu = jnp.where(res_comb > last_res * 0.9, mu * rho, mu)

        # freeze everything once done (matches the while_loop early exit)
        live = done == 0.0

        def fz(new, old):
            return jnp.where(live, new, old)

        return (fz(ynr, yr), fz(yni, yi), fz(znr, zr), fz(zni, zi),
                fz(mndr, mdr), fz(mndi, mdi), fz(nndr, ndr), fz(nndi, ndi),
                fz(atynr, atyr0), fz(atyni, atyi0), fz(nvr, vr), fz(nvi, vi),
                fz(nmu, mu), fz(res_comb, last_res), fz(nopt, opt_obj),
                fz(noxr, oxr), fz(noxi, oxi), fz(noyr, oyr), fz(noyi, oyi),
                jnp.where(live, it + 1.0, it),
                jnp.where(live, jnp.where(converged, 1.0, 0.0), done),
                jnp.where(live, jnp.where(converged, 1.0, 0.0), conv))

    out = jax.lax.fori_loop(0, maxiter, body, carry)
    oxr_ref[:] = out[15]
    oxi_ref[:] = out[16]
    oyr_ref[:] = out[17]
    oyi_ref[:] = out[18]
    stat_ref[0, 0] = out[19]                                   # iterations
    stat_ref[0, 1] = out[21]                                   # converged


@functools.partial(jax.jit, static_argnames=(
    "nt", "nr", "ladder", "scale_by_row", "rho", "tol_rel", "tol_abs",
    "maxiter", "interpret", "precision"))
def fused_infer_admm(a: Pair, b, u_mat: Pair, y0: Pair, z0: Pair, v0: Pair,
                     mu0, *, nt: int, nr: int, ladder,
                     scale_by_row: bool, rho: float, tol_rel: float,
                     tol_abs: float, maxiter: int,
                     interpret: bool = False,
                     precision: str = "default"):
    """Run the full InferADMM loop in one Pallas kernel.

    ``a``: (m, n); ``b``: (m,); ``u_mat``: (n, n) = inv(A^H A + I);
    ``y0``/``z0``: prepared initial state (r, m)/(r, n) in transposed
    layout; ``v0``: warm Z-prox eigenbasis in the E-convention of
    :func:`...cplx.panel_gram_basis_pair` (conjugated to W-convention at
    the kernel boundary).  Returns ``(opt_x, opt_y, converged, it)`` with
    opt_x (r, n) / opt_y (r, m) for ``scale_by_row=True`` and (1, n) /
    (1, m) (the argmin column) otherwise — matching
    :func:`..pair_solver.infer_admm_pair` up to fp32 noise.
    """
    m, n = a.shape
    r = y0.shape[-2]
    kern = functools.partial(
        _solve_kernel, nt=nt, nr=nr, ladder=tuple(ladder),
        scale_by_row=scale_by_row, rho=rho, tol_rel=tol_rel,
        tol_abs=tol_abs, maxiter=maxiter, precision=precision)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    rx = r if scale_by_row else 1
    out_shape = [jax.ShapeDtypeStruct((rx, n), jnp.float32),
                 jax.ShapeDtypeStruct((rx, n), jnp.float32),
                 jax.ShapeDtypeStruct((rx, m), jnp.float32),
                 jax.ShapeDtypeStruct((rx, m), jnp.float32),
                 jax.ShapeDtypeStruct((1, 2), jnp.float32)]
    mu_arr = jnp.asarray(mu0, jnp.float32).reshape(1, 1)
    # Pin DEFAULT matmul precision at the trace level and let the
    # ``precision`` mode set per-dot precision EXPLICITLY inside the
    # kernel: a global jax.default_matmul_precision("float32"/"highest")
    # leaking into every in-kernel dot overflows scoped VMEM (measured
    # r04: 18.84M > 16M at r=20, m~1k), whereas the split3 mode's
    # pre-split constants budget ~4 MB extra and compile fine.
    with jax.default_matmul_precision("default"):
        oxr, oxi, oyr, oyi, stat = pl.pallas_call(
            kern,
            in_specs=[vspec] * 11 + [pl.BlockSpec((1, 1),
                                                  memory_space=pltpu.SMEM)],
            out_specs=[vspec] * 4 + [pl.BlockSpec((1, 2),
                                                  memory_space=pltpu.SMEM)],
            out_shape=out_shape,
            interpret=interpret,
        )(a.re, a.im, b.reshape(1, m), u_mat.re, u_mat.im,
          y0.re, y0.im, z0.re, z0.im, v0.re, -v0.im, mu_arr)
    if not scale_by_row:
        oxr, oxi = oxr[0], oxi[0]
        oyr, oyi = oyr[0], oyi[0]
    converged = stat[0, 1] > 0.5
    it = stat[0, 0].astype(jnp.int32)
    return Pair(oxr, oxi), Pair(oyr, oyi), converged, it
