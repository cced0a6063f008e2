"""The 2ACE ADMM solver family — TPU-native core.

Re-implements, as pure jitted JAX with ``lax.while_loop`` inner iteration:

  - ``InferADMM``: the hot loop (X-update matmul, magnitude prox, spectral /
    nuclear Z-prox, dual updates, best-so-far tracking, residual convergence
    tests, mu adaptation).
    ref: main/src/my_recovery_algorithms/ADMM_v2/inferLowRankV4_multi.m:281-386
  - ``inferLowRankImpl``: over-parameterized solve + column orthonormalization
    + parallel refinement.  ref: inferLowRankV4_multi.m:111-271
  - ``inferLowRankV4_multi``: 3 restarts with internal train/test splits,
    spectral init, quality-gated rank-1 fallback, full-data refinement with
    similarity rollback, re-scaling.  ref: inferLowRankV4_multi.m:5-109
  - ``inferLowRank_Nuclear``: single-restart scaffold with the SVD
    soft-threshold prox.  ref: inferLowRank_Nuclear.m:5-100
  - ``inferMinL2``: the prox-free "version 0" ADMM.
    ref: inferMinL2.m:1-65, :229-326

Design notes (TPU-first):
  - ``U = inv(A'A + I)`` is precomputed once per solve via Cholesky and kept
    as an explicit matrix so each iteration's X-update is a single (n,n) x
    (n,r) matmul on the MXU.
  - The in-loop eigendecompositions (Z-prox Gram, column orthonormalization)
    use the fixed-cost parallel Jacobi solver (:mod:`.eigh_jacobi`) instead
    of host/LAPACK SVD.
  - Data-dependent control flow (convergence, mu adaptation, rank-1 retry,
    rollback) is ``lax.while_loop`` carry state and ``lax.cond`` branches, so
    the whole solve is one compiled XLA program and batches with ``vmap``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import AdmmConfig
from .eigh_jacobi import eigh_desc
from .prox import (
    magnitude_prox,
    nuclear_prox,
    profile_ladder,
    project_rows_to_magnitude,
    spectral_profile_prox,
)
from .spectral_init import spectral_initialize


class AdmmResult(NamedTuple):
    x: jax.Array          #: (n,) recovered vec(H)
    y: jax.Array          #: (m,) recovered complex measurements
    quality: jax.Array    #: held-out quality 1 - ||(|A x|) - b|| / ||b||
    converged: jax.Array  #: bool


def _fro2(x):
    return jnp.sum(jnp.abs(x) ** 2)


def _norm(x):
    return jnp.sqrt(_fro2(x))


def _precompute_u(a, reg: float = 1.0):
    """U = inv(A'A + reg*I) via Cholesky (PSD + identity => well-posed).

    ref: inferLowRankV4_multi.m:241-247.
    """
    n = a.shape[1]
    g = jnp.conj(a.T) @ a + reg * jnp.eye(n, dtype=a.dtype)
    c = jnp.linalg.cholesky(0.5 * (g + jnp.conj(g.T)))
    eye = jnp.eye(n, dtype=a.dtype)
    w = jax.scipy.linalg.solve_triangular(c, eye, lower=True)
    return jnp.conj(w.T) @ w


def _pinv(a):
    """Minimum-norm pseudo-inverse used by the v0 solver (ref: inferMinL2.m:166)."""
    m, n = a.shape
    if m >= n:
        g = jnp.conj(a.T) @ a
        g = g + 1e-12 * jnp.trace(g).real * jnp.eye(n, dtype=a.dtype) / n
        return jnp.linalg.solve(g, jnp.conj(a.T))
    g = a @ jnp.conj(a.T)
    g = g + 1e-12 * jnp.trace(g).real * jnp.eye(m, dtype=a.dtype) / m
    return jnp.conj(a.T) @ jnp.linalg.solve(g, jnp.eye(m, dtype=a.dtype))


def infer_admm(a, b, x0, *, scale_by_row: bool,
               prox: Optional[Callable] = None,
               u_mat=None, mu0: float = 1e-3, rho: float = 1.03,
               tol_rel: float = 1e-4, tol_abs: float = 1e-8,
               maxiter: int = 500):
    """One InferADMM solve.  Returns ``(x, y, converged)``.

    ``prox``: Z-prox callable ``(z, mu) -> z`` or None (no Z constraint —
    the inferMinL2 loop, ref: inferMinL2.m:229-326).  With a prox, the X
    update uses ``u_mat = inv(A'A+I)``; without, ``u_mat = pinv(A)``.

    Replicates the reference loop (ref: inferLowRankV4_multi.m:281-386):
    best-so-far tracking, three-residual convergence tests, and mu adaptation
    ``mu *= rho`` when the combined residual shrinks by less than 10%.
    """
    m, n = a.shape
    r = x0.shape[1]
    has_z = prox is not None
    rdt = jnp.finfo(a.dtype).dtype
    ah = jnp.conj(a.T)

    if u_mat is None:
        u_mat = _precompute_u(a) if has_z else _pinv(a)

    x = x0
    ax = a @ x
    if scale_by_row:
        x = x * (_norm(b) / jnp.maximum(_norm(ax), 1e-30)).astype(a.dtype)
    else:
        col = jnp.linalg.norm(ax, axis=0)
        x = x * (_norm(b) / jnp.maximum(col, 1e-30)).astype(a.dtype)[None, :]
    ax = a @ x
    y = project_rows_to_magnitude(ax, b, scale_by_row)
    aty = ah @ y
    if has_z:
        z = prox(x, jnp.asarray(1.0, rdt))
    else:
        z = jnp.zeros((0, 0), a.dtype)

    m_dual = jnp.zeros((m, r), a.dtype)
    n_dual = jnp.zeros((n, r), a.dtype) if has_z else jnp.zeros((0, 0), a.dtype)

    if scale_by_row:
        opt_x = jnp.zeros((n, r), a.dtype)
        opt_y = jnp.zeros((m, r), a.dtype)
    else:
        opt_x = jnp.zeros((n,), a.dtype)
        opt_y = jnp.zeros((m,), a.dtype)

    init = dict(y=y, z=z, m_dual=m_dual, n_dual=n_dual, aty=aty,
                mu=jnp.asarray(mu0, rdt), last_res=jnp.asarray(jnp.inf, rdt),
                opt_obj=jnp.asarray(jnp.inf, rdt), opt_x=opt_x, opt_y=opt_y,
                it=jnp.asarray(0, jnp.int32),
                done=jnp.asarray(False), converged=jnp.asarray(False))

    def cond(c):
        return jnp.logical_and(c["it"] < maxiter, jnp.logical_not(c["done"]))

    def body(c):
        y0, z0, aty0 = c["y"], c["z"], c["aty"]
        mu = c["mu"]
        muc = mu.astype(a.dtype)

        # X-update (ref :401-409 / inferMinL2.m:337-345)
        if has_z:
            rhs = ah @ (y0 - c["m_dual"] / muc) + (z0 - c["n_dual"] / muc)
            x = u_mat @ rhs
        else:
            x = u_mat @ (y0 - c["m_dual"] / muc)
        ax = a @ x

        # Y-update: magnitude prox (ref :511-533)
        y = magnitude_prox(ax, b, c["m_dual"], mu, scale_by_row)
        aty = ah @ y

        # Z-update (ref :423-485)
        if has_z:
            z = prox(x + c["n_dual"] / muc, mu)
        else:
            z = z0

        # dual updates (ref :336-341)
        j_m = ax - y
        m_dual = c["m_dual"] + muc * j_m
        if has_z:
            j_n = x - z
            n_dual = c["n_dual"] + muc * j_n
        else:
            j_n = jnp.zeros((0, 0), a.dtype)
            n_dual = c["n_dual"]

        # best-so-far (ref :343-361)
        if scale_by_row:
            obj = _norm(jnp.sqrt(jnp.sum(jnp.abs(ax) ** 2, axis=1)) - b)
            better = obj < c["opt_obj"]
            opt_x = jnp.where(better, x, c["opt_x"])
            opt_y = jnp.where(better, y, c["opt_y"])
            opt_obj = jnp.minimum(obj, c["opt_obj"])
        else:
            objs = jnp.linalg.norm(jnp.abs(ax) - b[:, None], axis=0)
            j = jnp.argmin(objs)
            obj = objs[j]
            better = obj < c["opt_obj"]
            opt_x = jnp.where(better, x[:, j], c["opt_x"])
            opt_y = jnp.where(better, y[:, j], c["opt_y"])
            opt_obj = jnp.minimum(obj, c["opt_obj"])

        # convergence tests (ref :363-375 / inferMinL2.m:303-315)
        nax, ny = _norm(ax), _norm(y)
        naty = _norm(aty)
        if has_z:
            nx, nz = _norm(x), _norm(z)
            res_prim = jnp.sqrt(_fro2(j_m) + _fro2(j_n))
            res_dual = mu * jnp.sqrt(_fro2(aty - aty0) + _fro2(z - z0))
            res_comb = jnp.sqrt(res_prim ** 2 + _fro2(y - y0) + _fro2(z - z0))
            t_prim = (tol_abs * math.sqrt((m + n) * r)
                      + tol_rel * jnp.sqrt(jnp.maximum(nax, ny) ** 2
                                           + jnp.maximum(nx, nz) ** 2))
            t_dual = (tol_abs * math.sqrt(n * r * 2)
                      + tol_rel * jnp.sqrt(naty ** 2 + nz ** 2))
            t_comb = (tol_abs * math.sqrt((m + n) * r * 2)
                      + tol_rel * jnp.sqrt(jnp.maximum(nax, ny) ** 2
                                           + jnp.maximum(nx, nz) ** 2
                                           + ny ** 2 + nz ** 2))
        else:
            res_prim = _norm(j_m)
            res_dual = mu * _norm(aty - aty0)
            res_comb = jnp.sqrt(res_prim ** 2 + _fro2(y - y0))
            t_prim = tol_abs * math.sqrt(m * r) + tol_rel * jnp.maximum(nax, ny)
            t_dual = tol_abs * math.sqrt(n * r) + tol_rel * naty
            t_comb = (tol_abs * math.sqrt(m * r * 2)
                      + tol_rel * jnp.sqrt(jnp.maximum(nax, ny) ** 2 + ny ** 2))

        converged = jnp.logical_or(
            jnp.logical_and(res_prim < t_prim, res_dual < t_dual),
            res_comb < t_comb)

        # mu adaptation (ref :377-382)
        mu = jnp.where(res_comb > c["last_res"] * 0.9, mu * rho, mu)

        return dict(y=y, z=z, m_dual=m_dual, n_dual=n_dual, aty=aty,
                    mu=mu, last_res=res_comb, opt_obj=opt_obj,
                    opt_x=opt_x, opt_y=opt_y, it=c["it"] + 1,
                    done=converged, converged=converged)

    out = lax.while_loop(cond, body, init)
    return out["opt_x"], out["opt_y"], out["converged"]


def _quality(a_test, b_test, x):
    """1 - ||(|A_test x|) - B_test|| / ||B_test||  (ref :68)."""
    return 1.0 - _norm(jnp.abs(a_test @ x) - b_test) / _norm(b_test)


def _make_prox(kind: str, nt: int, nr: int, m: int, n: int,
               use_rank_one: bool, cfg: AdmmConfig, eig_backend: str):
    if kind == "nuclear":
        return lambda z, mu: nuclear_prox(z, 1.0 / mu, eig_backend)
    ladder = profile_ladder(nt, nr, m, n, use_rank_one,
                            cfg.profile.rank_mults, cfg.profile.fractions,
                            mode=cfg.profile.ladder)
    return lambda z, mu: spectral_profile_prox(z, nt, nr, ladder, eig_backend)


def _impl(a, b, xs, nt, nr, use_rank_one: bool, cfg: AdmmConfig,
          prox_kind: str, eig_backend: str, ladder_m=None):
    """inferLowRankImpl: over-param solve -> orthonormalize -> refinement.

    ref: inferLowRankV4_multi.m:111-271.  Returns a single-column solution.
    ``ladder_m`` overrides the row count used for ladder selection
    (active rows of a padded problem; see solve_lowrank_multi).
    """
    m, n = a.shape
    lm = m if ladder_m is None else ladder_m
    prox = _make_prox(prox_kind, nt, nr, lm, n, use_rank_one, cfg,
                      eig_backend)
    # ridge weight lambda folded statically into U (exact at mu = 1; the
    # reference's X-update uses inv(A'A + (1 + lambda/mu) I),
    # inferLowRankV2.m:146 — every reference call site passes lambda = 0
    # except the version>4 escalation quirk, see dispatch.admm_v2, so the
    # mu-dependent re-inversion is not worth the hot-loop cost)
    u_mat = _precompute_u(a, reg=1.0 + cfg.lam)
    kw = dict(mu0=cfg.mu0, rho=cfg.rho, tol_rel=cfg.tol_rel,
              tol_abs=cfg.tol_abs, maxiter=cfg.maxiter)
    x, y, _ = infer_admm(a, b, xs, scale_by_row=True, prox=prox,
                         u_mat=u_mat, **kw)
    # orthonormalize columns: X <- X * eigvec(X'X)  (ref :263-264)
    g = jnp.conj(x.T) @ x
    _, v = eigh_desc(0.5 * (g + jnp.conj(g.T)), backend=eig_backend)
    x = x @ v
    x, y, converged = infer_admm(a, b, x, scale_by_row=False, prox=prox,
                                 u_mat=u_mat, **kw)
    return x, y, converged


def _refine_cond(a, b, x0, nt, nr, rank_one_flag, cfg, prox_kind, eig_backend,
                 ladder_m=None):
    """Full-data refinement with traced use_rank_one flag (ref :92,:100)."""
    m, n = a.shape
    lm = m if ladder_m is None else ladder_m
    kw = dict(mu0=cfg.mu0, rho=cfg.rho, tol_rel=cfg.tol_rel,
              tol_abs=cfg.tol_abs, maxiter=cfg.maxiter)

    def run(use_r1):
        prox = _make_prox(prox_kind, nt, nr, lm, n, use_r1, cfg, eig_backend)
        x, y, _ = infer_admm(a, b, x0, scale_by_row=True, prox=prox, **kw)
        return x, y

    return lax.cond(rank_one_flag, lambda: run(True), lambda: run(False))


def _normalize_problem(a, b, tol_abs):
    """Scale A to ||A||_F = sqrt(m_eff), B to unit norm (ref :27-38).

    ``m_eff`` counts ACTIVE rows (b > 0): static-shape padding rows
    (A_i = 0, b_i = 0) leave the normalization — and hence the effective
    ridge in U = inv(A^H A + I) — identical to the unpadded problem (the
    mobility tracker pads its sliding window to a fixed shape so the
    solver compiles once, ref: RSS_Mobility.m:155-188).
    """
    m_eff = jnp.maximum(jnp.sum(b > 0), 1).astype(jnp.float32)
    a_norm = _norm(a) / jnp.sqrt(m_eff)
    a_norm = jnp.where(a_norm < tol_abs, 1.0, a_norm)
    b_norm = _norm(b)
    b_norm = jnp.where(b_norm < tol_abs, 1.0, b_norm)
    return a / a_norm.astype(a.dtype), b / b_norm, a_norm, b_norm


def _split(key, m, frac, use_floor=True):
    k = int(math.floor(m * frac)) if use_floor else int(math.ceil(m * frac))
    perm = jax.random.permutation(key, m)
    return perm[:k], perm[k:]


@partial(jax.jit, static_argnames=("nt", "nr", "cfg", "prox_kind",
                                   "eig_backend", "n_restarts", "ladder_m"))
def solve_lowrank_multi(key, a, b, nt: int, nr: int,
                        cfg: AdmmConfig = AdmmConfig(),
                        prox_kind: str = "spectral_profile",
                        eig_backend: str = "jacobi",
                        n_restarts: Optional[int] = None,
                        ladder_m: Optional[int] = None,
                        x_seed=None) -> AdmmResult:
    """The 2ACE "A2" solver (ADMMLowRankV4): inferLowRankV4_multi.
    See :func:`_solve_lowrank_multi_impl` for the full contract; this
    wrapper applies ``cfg.matmul_precision`` at trace time (same policy
    as the pair solvers — a no-op on CPU, the usual home of this
    complex-dtype path, but on complex-capable accelerators the context
    is what makes the residual convergence tests actually fire).

    ``x_seed`` (optional, (n,) complex): a caller-provided warm-start
    direction — e.g. a sparse-CS estimate — planted in column 0 of every
    restart's init alongside the spectral columns.  The scaffold's own
    machinery arbitrates: ArgMinX picks the best column post-solve, so a
    bad seed costs nothing and a good one moves the basin (framework
    extension; the reference has no seeding hook)."""
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _solve_lowrank_multi_impl(key, a, b, nt, nr, cfg, prox_kind,
                                         eig_backend, n_restarts, ladder_m,
                                         x_seed)


def _solve_lowrank_multi_impl(key, a, b, nt, nr, cfg, prox_kind,
                              eig_backend, n_restarts, ladder_m,
                              x_seed=None) -> AdmmResult:
    """The 2ACE "A2" solver (ADMMLowRankV4): inferLowRankV4_multi.

    ref: inferLowRankV4_multi.m:5-109.  ``n_restarts=1`` reproduces the
    single-restart scaffold shared by inferLowRank_Nuclear (ref
    inferLowRank_Nuclear.m:40-100) and the historical V4.

    Deviations from the reference (documented):
      - the refinement gate uses the *best* restart's quality; the MATLAB
        code compares the last restart's quality (ref :89) which is
        presumably unintended.
      - PRNG streams are JAX threefry, not MATLAB twister, so train/test
        splits differ realization-by-realization.

    Rows with ``b == 0`` are inactive padding BY CONTRACT (A rows zero
    too; real measured amplitudes are strictly positive, A2only.m:130-139).
    ``ladder_m`` gives the ACTIVE row count of a padded problem so the
    constraint-ladder selection (the ``m >= 3n`` test,
    inferLowRankV4_multi.m:447) follows the active shape; snap it to the
    branch boundary to avoid per-length recompiles
    (pipeline.mobility._ladder_m_for_window).
    """
    n_restarts = cfg.n_restarts if n_restarts is None else n_restarts
    m, n = a.shape
    r = min(cfg.rank, m, n)
    lm_full = m if ladder_m is None else ladder_m
    lm_tr = int(math.floor(lm_full * cfg.cc_frac))
    a, b, a_norm, b_norm = _normalize_problem(a, b, cfg.tol_abs)
    thr = cfg.quality_threshold

    best = None
    for i in range(n_restarts):
        ki = jax.random.fold_in(key, i)
        k_split, k_init = jax.random.split(ki)
        train, test = _split(k_split, m, cfg.cc_frac)
        a_tr, b_tr = a[train], b[train]
        a_te, b_te = a[test], b[test]

        xs = spectral_initialize(a_tr, b_tr, r, key=k_init)
        if x_seed is not None:
            # plant the caller's warm-start direction in column 0, scaled
            # to the spectral columns' norm level (the problem was
            # normalized above, the seed was not)
            seed = x_seed.astype(xs.dtype)
            seed = seed / jnp.maximum(jnp.linalg.norm(seed), 1e-30)
            col = jnp.linalg.norm(xs, axis=0).mean()
            xs = xs.at[:, 0].set(seed * col.astype(xs.dtype))
        x, y, _ = _impl(a_tr, b_tr, xs, nt, nr, False, cfg, prox_kind,
                        eig_backend, ladder_m=lm_tr)
        q = _quality(a_te, b_te, x)

        # rank-1 fallback when quality is poor (ref :73-77).  The nuclear
        # prox ignores use_rank_one, so the retry is an exact no-op there.
        if prox_kind != "nuclear":
            poor = q < thr

            def retry():
                xr, yr, _ = _impl(a_tr, b_tr, xs, nt, nr, True, cfg,
                                  prox_kind, eig_backend, ladder_m=lm_tr)
                return xr, yr, _quality(a_te, b_te, xr)

            x, y, q = lax.cond(poor, retry, lambda: (x, y, q))
            rank_one = poor
        else:
            rank_one = jnp.asarray(False)

        if best is None:
            best = (x, y, q, rank_one)
        else:
            better = q > best[2]
            best = (jnp.where(better, x, best[0]),
                    jnp.where(better, y, best[1]),
                    jnp.maximum(q, best[2]),
                    jnp.where(better, rank_one, best[3]))

    x_max, y_max, q_max, rank_one = best

    # full-data refinement with similarity rollback (ref :89-101)
    x_ref, y_ref = _refine_cond(a, b, x_max[:, None], nt, nr, rank_one, cfg,
                                prox_kind, eig_backend, ladder_m=lm_full)
    x_ref, y_ref = x_ref[:, 0], y_ref[:, 0]
    similarity = (jnp.abs(jnp.vdot(x_max, x_ref))
                  / jnp.maximum(_norm(x_max) * _norm(x_ref), 1e-30))
    rollback = jnp.logical_and(q_max > thr,
                               similarity < cfg.similarity_threshold)
    x = jnp.where(rollback, x_max, x_ref)
    # on rollback the reference returns the train-split Y (ref :96-97), whose
    # length differs from the full-data Y; we return the full-codebook
    # prediction A x instead (Y is diagnostic only downstream).
    y = jnp.where(rollback, a @ x_max, y_ref)

    scale = (b_norm / a_norm).astype(a.dtype)
    return AdmmResult(x=x * scale, y=y * scale, quality=q_max,
                      converged=jnp.asarray(True))


@partial(jax.jit, static_argnames=("cfg",))
def solve_minl2(key, a, b, cfg: AdmmConfig = AdmmConfig()) -> AdmmResult:
    """Version-0 ADMM without the low-rank constraint (inferMinL2).

    ref: inferMinL2.m:1-65 — single ceil(m*0.95) split, pinv(A) X-update,
    quality-gated refinement with similarity rollback.
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _solve_minl2_impl(key, a, b, cfg)


def _solve_minl2_impl(key, a, b, cfg: AdmmConfig) -> AdmmResult:
    m, n = a.shape
    r = min(cfg.rank, m, n)
    a, b, a_norm, b_norm = _normalize_problem(a, b, cfg.tol_abs)
    train, test = _split(key, m, 0.95, use_floor=False)
    a_tr, b_tr = a[train], b[train]
    a_te, b_te = a[test], b[test]

    kw = dict(mu0=cfg.mu0, rho=cfg.rho, tol_rel=cfg.tol_rel,
              tol_abs=cfg.tol_abs, maxiter=cfg.maxiter)

    xs = spectral_initialize(a_tr, b_tr, r, key=jax.random.fold_in(key, 1))
    u_tr = _pinv(a_tr)
    x, y, _ = infer_admm(a_tr, b_tr, xs, scale_by_row=True, prox=None,
                         u_mat=u_tr, **kw)
    g = jnp.conj(x.T) @ x
    _, v = eigh_desc(0.5 * (g + jnp.conj(g.T)))
    x = x @ v
    x, y, converged = infer_admm(a_tr, b_tr, x, scale_by_row=False, prox=None,
                                 u_mat=u_tr, **kw)
    q = _quality(a_te, b_te, x)

    def refine():
        xr, yr, _ = infer_admm(a, b, x[:, None], scale_by_row=True, prox=None,
                               **kw)
        xr, yr = xr[:, 0], yr[:, 0]
        sim = (jnp.abs(jnp.vdot(x, xr))
               / jnp.maximum(_norm(x) * _norm(xr), 1e-30))
        keep = sim < cfg.similarity_threshold
        # see solve_lowrank_multi: full-codebook prediction on rollback
        return jnp.where(keep, x, xr), jnp.where(keep, a @ x, yr)

    x, y = lax.cond(q > cfg.quality_threshold, refine, lambda: (x, a @ x))
    scale = (b_norm / a_norm).astype(a.dtype)
    return AdmmResult(x=x * scale, y=y * scale, quality=q, converged=converged)
