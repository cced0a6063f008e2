"""Remaining compressive-phase-retrieval baselines.

  - CPRL: lifted sparse PhaseLift ``min ||b - A(X)||_1 + mu ||X||_1, X >= 0``
    (ref: main/src/my_recovery_algorithms/MyCPRL.m:66-116; the reference
    solves it with CVX/Mosek — here: proximal subgradient with smoothed L1
    data term, elementwise soft-threshold, and PSD projection).
  - lifted OMP: OMP on the rank-1-lifted system (ref: MyOMP.m:63-82).
  - SparsePL: correlation pre-screening to 5% of columns, then PhaseLift on
    the reduced dictionary (ref: MySparsePL.m:70-120).
  - conventional CS with perfect/noisy phase: EMBGAMP with OMP fallback
    (ref: My_Conventional_CS.m:14-30).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import PhaseLiftConfig
from .gamp import embgamp
from .omp import omp
from .phaselift import _adjoint, _apply_linop, _lipschitz, phaselift_fista


@partial(jax.jit, static_argnames=("iters",))
def cprl(measurements, a, mu: float = 5e-2, iters: int = 500,
         smooth_eps: float = 1e-6):
    """CPRL lifted sparse phase retrieval.

    ``measurements``: (m,) intensities; ``a``: (m, n).  Returns the rank-1
    extraction sqrt(w_max) v_max (ref: MyCPRL.m:110-116).
    """
    m, n = a.shape
    b = jnp.real(measurements)
    # subgradient scale: the L1 data-term gradient is bounded row-wise, so a
    # diminishing step t_k = t0 / sqrt(k+1) converges to the solution set
    t0 = (jnp.mean(b) / _lipschitz(a)) * m ** 0.5

    def body(x, k):
        t = t0 / jnp.sqrt(1.0 + k)
        r = _apply_linop(a, x) - b
        # smoothed L1 data term: grad = A*(r / sqrt(r^2 + eps))
        g = _adjoint(a, r / jnp.sqrt(r * r + smooth_eps))
        z = x - t.astype(a.dtype) * g
        # elementwise complex soft threshold (prox of mu*||X||_1)
        mag = jnp.abs(z)
        z = z * (jnp.maximum(mag - t * mu, 0.0)
                 / jnp.maximum(mag, 1e-30)).astype(a.dtype)
        # PSD projection
        z = 0.5 * (z + jnp.conj(z.T))
        w, v = jnp.linalg.eigh(z)
        w = jnp.maximum(w, 0.0)
        return (v * w.astype(v.dtype)) @ jnp.conj(v.T), None

    x0 = jnp.zeros((n, n), a.dtype)
    x, _ = lax.scan(body, x0, jnp.arange(iters, dtype=jnp.float32))
    w, v = jnp.linalg.eigh(x)
    return jnp.sqrt(jnp.maximum(w[-1], 0.0)).astype(a.dtype) * v[:, -1]


@partial(jax.jit, static_argnames=("s",))
def lifted_omp(measurements, a, s: int):
    """OMP on the lifted system: rows kron(a_i^T, a_i^H), unknown vec(xx^H).

    ref: MyOMP.m:63-82.  O(m n^2) memory — small-n baselines only.
    """
    m, n = a.shape
    a_lift = jnp.einsum("in,im->inm", a, jnp.conj(a)).reshape(m, n * n)
    vec_z = omp(a_lift, jnp.real(measurements).astype(a.dtype), max_steps=s)
    z = vec_z.reshape(n, n)
    z = 0.5 * (z + jnp.conj(z.T))
    w, v = jnp.linalg.eigh(z)
    return jnp.sqrt(jnp.maximum(w[-1], 0.0)).astype(a.dtype) * v[:, -1]


@partial(jax.jit, static_argnames=("cfg", "keep"))
def sparse_phaselift(measurements, a, keep: int = 0,
                     cfg: PhaseLiftConfig = PhaseLiftConfig()):
    """Correlation pre-screen to ~5% of columns, then PhaseLift.

    ref: MySparsePL.m:77-120.  ``measurements``: intensities; screening uses
    sum_i |A_ij| * y_i (ref :80-84).
    """
    m, n = a.shape
    k = keep if keep > 0 else max(1, math.ceil(0.05 * n))
    y = jnp.sqrt(jnp.real(measurements))
    corr = jnp.sum(jnp.abs(a) * y[:, None], axis=0)
    _, idx = lax.top_k(corr, k)
    a_red = a[:, idx]
    xt = phaselift_fista(a_red, jnp.real(measurements), cfg).x
    out = jnp.zeros((n,), a.dtype)
    return out.at[idx].set(xt)


def conventional_cs(measurements_complex, a, s: int, noise_power: float,
                    use_gamp: bool = True):
    """Conventional CS assuming (perfect or noisy) phase is available.

    ref: My_Conventional_CS.m:14-30 — EMBGAMP with lambda learning; OMP is
    the documented fallback and also available via ``use_gamp=False``.
    """
    n = a.shape[1]
    if use_gamp:
        snr_db = 10.0 * jnp.log10(1.0 / jnp.maximum(noise_power, 1e-20))
        x = embgamp(measurements_complex, a, snr_db, lam0=s / n,
                    learn_lambda=True)
        # EMBGAMP can diverge on hard instances; the reference wraps it in
        # try/catch and falls back to OMP (My_TwoStage_Recovery.m:173-178).
        # Under jit divergence shows up as non-finite output OR as a finite
        # COLLAPSED iterate (EM shrinks the sparsity to ~0 and x sticks at
        # the zero fixed point, residual ~ ||y||).  The gate detects only
        # those failure modes — NOT a fit-vs-OMP comparison: OMP's greedy
        # least-squares refit generically attains a smaller data residual
        # than GAMP's MMSE-shrunk posterior mean even when GAMP's NMSE is
        # better, so comparing residuals would wrongly discard healthy
        # GAMP estimates (matching the reference, which falls back only on
        # an exception).
        #
        # The collapse test is NOISE-AWARE: a perfect estimate's residual
        # power is ~ m*noise_power, which below roughly -7 dB SNR already
        # exceeds (0.9*||y||)^2 — a plain r < 0.9||y|| gate would then
        # silently discard healthy GAMP output.  A residual is treated as
        # collapse only if it beats NEITHER the zero-solution bound NOR
        # the expected noise floor (2x margin on E||w||^2 = m*sigma^2).
        y = measurements_complex
        m = a.shape[0]
        fin = jnp.isfinite(x.real) & jnp.isfinite(x.imag)
        x_safe = jnp.where(fin, x, 0.0)
        x_omp = omp(a, y, max_steps=s)
        r2_gamp = jnp.sum(jnp.abs(y - a @ x_safe) ** 2)
        floor2 = jnp.maximum(0.81 * jnp.sum(jnp.abs(y) ** 2),
                             2.0 * m * noise_power)
        ok = jnp.logical_and(jnp.all(fin), r2_gamp < floor2)
        return jnp.where(ok, x, x_omp)
    return omp(a, measurements_complex, max_steps=s)


@jax.jit
def unconventional_cs(measurements, f):
    """Norm-constrained ridge least squares (the "unconventional CS" entry).

    ref: main/src/my_recovery_algorithms/My_Unconventional_CS.m:1-16 —
    solve ``x = (A'A + lam I)^{-1} A'b`` with ``A = F^T`` and ``lam`` picked
    so ``||x|| = 1``.  In the eigenbasis of A'A the norm is
    ``||c / (s + lam)||`` with ``c = U'A'b`` — monotone decreasing in lam —
    so the reference's black-box 1-D fmincon over [0, 1] becomes a fixed
    50-step bisection under jit.
    """
    b = jnp.asarray(measurements)
    a = jnp.asarray(f).T
    w = a.shape[1]
    s, u = jnp.linalg.eigh(jnp.conj(a.T) @ a)
    c = jnp.conj(u.T) @ (jnp.conj(a.T) @ b)

    def norm_at(lam):
        return jnp.linalg.norm(c / (s + lam))

    def body(_, lo_hi):
        lo, hi = lo_hi
        mid = 0.5 * (lo + hi)
        too_big = norm_at(mid) > 1.0       # need more shrinkage -> raise lam
        return (jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid))

    lo, hi = lax.fori_loop(0, 50, body, (jnp.asarray(0.0, s.dtype),
                                         jnp.asarray(1.0, s.dtype)))
    lam = 0.5 * (lo + hi)
    return u @ (c / (s + lam))
